package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark (driver contract: ONE JSON line on stdout; build.sbt
  * sets `run / outputStrategy := StdoutOutput` so the forked JVM's stdout is
  * NOT wrapped in sbt `[info]` prefixes — the driver parses this line).
  *
  * Two measurements:
  *  1. Headline (BASELINE.md protocol): end-to-end PDF→text extraction
  *     throughput (docs/sec) over the synthesized skewed corpus at two
  *     parallelism levels (default local[4] vs local[16]) on identical
  *     input — the sandbox evidence for the north rule's N→4N
  *     scaling-efficiency criterion (target ≥ 0.8).
  *
  *     The sandbox host is an oversubscribed VM: a fixed-work spin test
  *     shows per-thread slowdown appears and disappears with co-tenant
  *     load (16 identical processes take 3.9s in a quiet window and 7.3s
  *     in a noisy one; 1 process always takes ~4.2s). A single N/4N pair
  *     can therefore land in different noise regimes and report nonsense
  *     (BENCH_r01 recorded 0.114 that way). Protocol: INTERLEAVE the
  *     levels (N,4N,N,4N,…) so both sample the same load distribution,
  *     and take the best rep per level — the standard contention-filtering
  *     estimator for "what does this code do on an idle machine".
  *  2. All SparkEntry queries timed at SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS,
  *     each with an ok flag and row count (a throwing query must not look
  *     like a fast success).
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Force full extraction; returns (seconds, docs, pages, chars). */
  private def runExtraction(spark: SparkSession, nDocs: Long, parts: Int): (Double, Long, Long, Long) = {
    import org.apache.spark.sql.functions._
    // narrow plan: synthesize directly into `parts` partitions; no payload shuffle
    val pages = graft.spark.PagesTable.synthesize(spark, nDocs, parts)
    val t0 = System.nanoTime()
    val row = graft.spark.ExtractPipeline.extract(pages)
      .agg(count(lit(1)), sum(col("n_pages")), sum(col("n_chars"))).collect()(0)
    val sec = (System.nanoTime() - t0) / 1e9
    (sec, row.getLong(0), row.getLong(1), row.getLong(2))
  }

  /** Pull `queries_normalized` out of a prior bench artifact, whether it is
    * the raw JSON line Bench prints (BENCH_LOCAL.json) or the driver's
    * round wrapper whose "tail" field escapes every quote as `\"`. Returns
    * empty when the artifact's `"sf"` doesn't match `sfDir` (different scale
    * factors aren't comparable even probe-normalized) or when the map was
    * truncated out of the captured tail. Pure, so BenchPrevSpec can pin it
    * against the real BENCH_r04.json / BENCH_LOCAL.json committed in-repo.
    */
  def extractPrevNormalized(rawText: String, sfDir: String): Map[String, Double] = {
    val txt = rawText.replace("\\\"", "\"")
    val sfOk = s""""sf":"$sfDir"""".r.findFirstIn(txt).isDefined
    if (!sfOk) Map.empty
    else """"queries_normalized":\{([^}]*)\}""".r.findFirstMatchIn(txt).map {
      _.group(1).split(",").toSeq.flatMap { kv =>
        kv.split(":") match {
          case Array(k, v) =>
            try Some(k.replace("\"", "") -> v.toDouble)
            catch { case _: Throwable => None }
          case _ => None
        }
      }.toMap
    }.getOrElse(Map.empty)
  }

  /** Prior artifact's raw per-query seconds (same unescape/sf rules as
    * [[extractPrevNormalized]]) — needed to re-normalize the prior run in
    * BANDWIDTH-probe units for the dual-unit regression gate. */
  def extractPrevQueriesRaw(rawText: String, sfDir: String): Map[String, Double] = {
    val txt = rawText.replace("\\\"", "\"")
    if (s""""sf":"$sfDir"""".r.findFirstIn(txt).isEmpty) Map.empty
    else """"queries":\{([^}]*)\}""".r.findFirstMatchIn(txt).map {
      _.group(1).split(",").toSeq.flatMap { kv =>
        kv.split(":") match {
          case Array(k, v) =>
            try Some(k.replace("\"", "") -> v.toDouble)
            catch { case _: Throwable => None }
          case _ => None
        }
      }.toMap
    }.getOrElse(Map.empty)
  }

  /** Prior artifact's bandwidth-probe seconds, if recorded. */
  def extractPrevBwProbe(rawText: String, sfDir: String): Option[Double] =
    extractPrevProbe(rawText, sfDir, "bw_probe_sec")

  /** Prior artifact's scheduler-latency probe, if recorded (added after
    * the 2026-08-20 finding that neither the CPU spin nor the bandwidth
    * probe tracks the regime that dominates many-small-job queries). */
  def extractPrevJobProbe(rawText: String, sfDir: String): Option[Double] =
    extractPrevProbe(rawText, sfDir, "job_probe_sec")

  private def extractPrevProbe(rawText: String, sfDir: String,
                               key: String): Option[Double] = {
    val txt = rawText.replace("\\\"", "\"")
    if (s""""sf":"$sfDir"""".r.findFirstIn(txt).isEmpty) None
    else (s""""$key":([0-9.]+)""").r.findFirstMatchIn(txt)
      .flatMap(m => try Some(m.group(1).toDouble) catch {
        case _: Throwable => None
      })
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // 600 k docs: the 4N leg runs ~15 s — long enough to average over the
    // host's sub-10 s contention bursts that a 7 s leg samples whole
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "600000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt // quiet pairs to collect; adaptive up to MAX_REPS
    val levelN = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "4").toInt
    val level4N = levelN * 4

    // --- phase 1: extraction scaling, interleaved N/4N reps ----------------
    // One SparkContext per JVM: the two levels must run in SEPARATE,
    // sequential sessions (a second getOrCreate with a different master
    // silently reuses the first context — that bug made both levels run at
    // N threads). Each rep creates a fresh session for its level, does a
    // small warm run (JIT is JVM-wide and persists; only scheduler paths
    // and the fixture broadcast need warming), then measures.
    def measureOnce(level: Int, docs: Long = nDocs): (Double, Long, Long, Long) = {
      val s = session(level)
      try {
        runExtraction(s, 2000, level * 3) // warm scheduler + fixture broadcast
        // reset collector state before the timed run: adaptive GC sizing
        // carries heap pressure from the previous leg into this one (a
        // measured 10-25% leg drift that reads as scaling noise); paired
        // with -Xms=-Xmx in build.sbt so generation sizes stay fixed
        System.gc(); Thread.sleep(200)
        runExtraction(s, docs, level * 3)
      } finally {
        s.stop()
        SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      }
    }
    // Host-noise calibration: the same fixed scalar loop on 1 thread and on
    // `level4N` threads. On a quiet machine the per-thread slowdown ≈ 1; the
    // oversubscribed-host windows show up as 1.5-2×. Recorded in the JSON so
    // the artifact itself says whether the window was quiet.
    def spinSeconds(threads: Int): Double = {
      val iters = 600000000L
      val t0 = System.nanoTime()
      val ts = (1 to threads).map { s =>
        val th = new Thread(() => {
          var x = s.toLong; var k = 0L
          while (k < iters) { x = x * 6364136223846793005L + 1442695040888963407L; k += 1 }
          if (x == 42L) println("")
        })
        th.start(); th
      }
      ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    def hostNoise(): Double = {
      val s1 = spinSeconds(1)
      val sN = spinSeconds(level4N)
      sN / s1 // ≈1 quiet, >1.3 noisy
    }

    // Memory-BANDWIDTH probe: parallel streaming sum over a large buffer.
    // The single-thread spin probe is register-bound and blind to co-tenant
    // bandwidth pressure, which inflates every parallel Spark query
    // uniformly while spin ratios read ~1.0 — this probe sees it.
    lazy val bwArrays: Array[Array[Long]] = {
      val threads = math.min(8, cpus)
      val words = 8 << 20 // 64 MiB per thread
      val as = Array.fill(threads)(new Array[Long](words))
      as.foreach(a => java.util.Arrays.fill(a, 3L))
      as
    }
    def bwProbeSec(): Double = {
      val arrays = bwArrays
      val t0 = System.nanoTime()
      val ts = arrays.map { a =>
        val th = new Thread(() => {
          var s = 0L
          var pass = 0
          while (pass < 4) {
            var i = 0
            while (i < a.length) { s += a(i); i += 1 }
            pass += 1
          }
          if (s == 42L) println("")
        })
        th.start(); th
      }
      ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }

    val skipScaling = sys.env.get("SPARK_GRAFT_SKIP_SCALING").contains("1")

    // one-time JIT warm-up before any timed rep (small corpus, throwaway)
    if (!skipScaling) locally {
      val s = session(level4N)
      try runExtraction(s, 20000, level4N * 3)
      finally { s.stop(); SparkSession.clearActiveSession(); SparkSession.clearDefaultSession() }
    }
    // Noise-gated protocol with a METRIC-INDEPENDENT stop rule (the round-2
    // loop stopped as soon as best-of efficiency cleared the bar — a
    // result-conditioned rule that rejected deflating noise but accepted
    // inflating noise; it recorded a physically meaningless 1.353 once).
    // Here: each pair carries THREE host-noise probes — before the N leg,
    // between the legs, after the 4N leg (a burst that starts and ends
    // inside one leg slips past two-sided brackets; a recorded quiet pair
    // at 0.628 motivated the mid-probe); a pair is QUIET iff all three are
    // ≤ 1.2. Pairs run until `reps` quiet pairs are collected (or the hard
    // cap), regardless of what efficiency they show. The headline efficiency
    // is the MEDIAN over quiet-pair efficiencies — an estimator that never
    // looks at the value while sampling. A median > 1.05 is physically
    // impossible on this workload and is flagged + clamped, never trusted.
    // r4 recorded only 3/12 quiet pairs (flagged, under the 5-pair target)
    // on a noisy host window — double the sampling budget so the target is
    // reachable even when most windows are contended (VERDICT r4 task #2)
    val maxReps = math.max(reps, sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_REPS", "24").toInt)
    // The spin probe is register-bound and BLIND to memory-bandwidth
    // contention — the r4/r5 runs show "quiet" pairs (all spin ratios ≤1.2)
    // with efficiencies of 0.69-0.76 next to 0.89-0.94 pairs in the same
    // run: a co-tenant streaming memory inflates the 16-thread leg but not
    // the spin ratio. So each pair ALSO brackets the legs with the
    // streaming-sum bandwidth probe; a pair is quiet only if its slowest
    // bw probe is within 30% of the run's MEDIAN bw probe. The reference
    // was originally the running MIN, but the min is an extreme order
    // statistic: its gap to typical probes GROWS with sample count, so a
    // 24-rep run gated itself harder than a 6-rep run measuring the same
    // host (observed 2026-08-20: spin probes flat at 1.0-1.2 on all 24
    // pairs, bw probes jittering 0.030-0.057 with min 0.030 — only 3
    // pairs passed the min-gate while their effs 0.948-0.981 matched the
    // rejected pairs'). The median is robust to both the lucky min and
    // burst maxima, and remains metric-independent (never consults
    // efficiency; recomputed over the final sample before scoring).
    final case class Pair(n: (Double, Long, Long, Long), f: (Double, Long, Long, Long),
                          noiseBefore: Double, noiseMid: Double, noiseAfter: Double,
                          bwBefore: Double, bwMid: Double, bwAfter: Double) {
      def spinQuiet: Boolean = noiseBefore <= 1.2 && noiseMid <= 1.2 && noiseAfter <= 1.2
      def bwMax: Double = math.max(bwBefore, math.max(bwMid, bwAfter))
      def quiet(bwRef: Double): Boolean = spinQuiet && bwMax <= bwRef * 1.30
      def eff: Double = ((f._2 / f._1) / (n._2 / n._1)) / 4.0
    }
    val pairs = scala.collection.mutable.ArrayBuffer[Pair]()
    val bwSamples = scala.collection.mutable.ArrayBuffer[Double]()
    if (!skipScaling) bwSamples ++= (1 to 3).map(_ => bwProbeSec())
    var bwMin = if (skipScaling) 1.0 else bwSamples.min
    def bwMedian: Double =
      if (bwSamples.isEmpty) 1.0
      else {
        val s = bwSamples.sorted
        if (s.length % 2 == 1) s(s.length / 2)
        else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
      }
    var rep = 0
    // Each pair runs its legs INTERLEAVED and TWICE (N,4N,N,4N) and keeps
    // the best rate per level: the ~0.05 s probes bracket a 45 s leg but
    // cannot see a burst that lives entirely inside it (recorded quiet
    // pairs at 0.727 next to 0.974 in the same run), and on a shared host
    // the contention bias is asymmetric — a co-tenant steals directly
    // from the 16-thread leg while the 4-thread leg migrates to idle
    // cores, so unprobed noise systematically DEFLATES efficiency. Best-
    // of-2 per level is symmetric, squares the per-leg burst probability,
    // and never consults the efficiency while sampling.
    val legReps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_LEG_REPS", "2").toInt)
    def bestOf(rs: Seq[(Double, Long, Long, Long)]) = rs.minBy(r => r._1 / r._2)
    while (!skipScaling && rep < maxReps && pairs.count(_.quiet(bwMedian)) < reps) {
      val nb = hostNoise(); val bb = bwProbeSec()
      val nLegs = scala.collection.mutable.ArrayBuffer[(Double, Long, Long, Long)]()
      val fLegs = scala.collection.mutable.ArrayBuffer[(Double, Long, Long, Long)]()
      var leg = 0
      var mid: Option[(Double, Double)] = None
      while (leg < legReps) {
        nLegs += measureOnce(levelN)
        fLegs += measureOnce(level4N)
        leg += 1
        if (leg * 2 >= legReps && mid.isEmpty) // mid probe once, at the midpoint
          mid = Some((hostNoise(), bwProbeSec()))
      }
      val (nm, bm) = mid.getOrElse((hostNoise(), bwProbeSec()))
      val rN = bestOf(nLegs.toSeq)
      val r4N = bestOf(fLegs.toSeq)
      val na = hostNoise(); val ba = bwProbeSec()
      bwMin = math.min(bwMin, math.min(bb, math.min(bm, ba)))
      bwSamples ++= Seq(bb, bm, ba)
      pairs += Pair(rN, r4N, nb, nm, na, bb, bm, ba)
      rep += 1
    }
    if (pairs.isEmpty) {
      // query-only mode (SPARK_GRAFT_SKIP_SCALING=1): one tiny pair keeps
      // the artifact schema intact; its efficiency is NOT a scaling claim
      val nb = hostNoise()
      val rN = measureOnce(levelN, 20000)
      val nm = hostNoise()
      val r4N = measureOnce(level4N, 20000)
      pairs += Pair(rN, r4N, nb, nm, hostNoise(), bwMin, bwMin, bwMin)
      rep += 1
    }
    val noiseBefore = pairs.head.noiseBefore
    val noiseAfter = pairs.last.noiseAfter
    val quietPairs = pairs.filter(_.quiet(bwMedian))
    // fall back to all pairs (flagged) if the host never went quiet
    val scored = if (quietPairs.nonEmpty) quietPairs else pairs
    val effs = scored.map(_.eff).sorted
    val effMedian =
      if (effs.length % 2 == 1) effs(effs.length / 2)
      else (effs(effs.length / 2 - 1) + effs(effs.length / 2)) / 2.0
    // under-target quiet-pair count = the window never settled; the median
    // over so few pairs is not certifiable either way → flagged
    val effFlagged = skipScaling || effMedian > 1.05 || quietPairs.length < reps
    val eff = math.min(effMedian, 1.0)
    // rate-median variant (secondary): median per-level docs/sec across the
    // quiet pairs, then the ratio — robust to one distorted leg (which a
    // pooled/mean rate is not), and still never consults the efficiency
    // while sampling
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2) else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    val effRateMedian = {
      val rN = median(scored.map(p => p.n._2.toDouble / p.n._1).toSeq)
      val r4N = median(scored.map(p => p.f._2.toDouble / p.f._1).toSeq)
      (r4N / rN) / 4.0
    }

    // throughput numbers: best rep per level among scored pairs (absolute
    // docs/sec headline; the efficiency above does NOT use these)
    val (tN, dN, _, _) = scored.map(_.n).minBy(_._1)
    val (t4N, d4N, p4N, c4N) = scored.map(_.f).minBy(_._1)
    val thrN = dN / tN
    val thr4N = d4N / t4N

    // --- phase 2: the full query suite at the driver's parallelism ---------
    val spark = session(cpus)
    // HTML-path throughput (boilerplate-strip pipeline), same session
    val htmlThr = {
      import org.apache.spark.sql.functions._
      val ds = graft.spark.PagesTable.synthesizeHtml(spark, 20000, cpus * 3)
      graft.spark.ExtractPipeline.extract(ds).agg(count(lit(1))).collect() // warm
      val t0 = System.nanoTime()
      val n = graft.spark.ExtractPipeline.extract(ds)
        .agg(count(lit(1))).collect()(0).getLong(0)
      n / ((System.nanoTime() - t0) / 1e9)
    }
    // rasterizer throughput: distributed page renders (multimodal path)
    val renderThr = {
      import spark.implicits._
      val ds = graft.spark.PagesTable.synthesize(spark, 4000, cpus * 3)
      def run(): Long = graft.spark.ExtractPipeline.mapDocs(ds) { (_, d) =>
        if (d.pageCount == 0) Iterator.empty
        else {
          val bmp = graft.core.render.Rasterizer.render(d.page(0), scale = 0.5)
          Iterator.single(bmp.inkFraction)
        }
      }.filter(_ >= 0.0).count()
      run() // warm
      val t0 = System.nanoTime()
      val n = run()
      n / ((System.nanoTime() - t0) / 1e9)
    }
    // pre-warm the SQL parser + UDF registration path so the first SQL-using
    // query isn't charged for one-time classloading/JIT
    try {
      graft.functions.PdfFunctions.register(spark)
      spark.sql("SELECT 1").collect()
    } catch { case _: Throwable => () }
    // fused-native-expression note (VERDICT r4 task #4): a two-stat select
    // through pdf_stats_native parses each payload ONCE vs twice for the
    // per-column expressions — measure the ratio on a small corpus
    val nativeFusedSpeedup = try {
      graft.functions.NativeRegistry.register(spark)
      graft.spark.PagesTable.synthesize(spark, 4000, cpus)
        .toDF().createOrReplaceTempView("bench_nv")
      def time(q: String): Double = {
        spark.sql(q).count() // warm
        val t0 = System.nanoTime()
        spark.sql(q).collect()
        (System.nanoTime() - t0) / 1e9
      }
      val perCol = time("SELECT url, pdf_page_count_native(html) AS p, pdf_char_count_native(html) AS c FROM bench_nv")
      val fused = time("SELECT url, s.n_pages AS p, s.n_chars AS c FROM (SELECT url, pdf_stats_native(html) AS s FROM bench_nv)")
      perCol / fused
    } catch { case _: Throwable => -1.0 }

    // Per-query timing uses the same contention-filtering estimator as the
    // scaling phase: each query runs `queryReps` times (sequentially, whole
    // suite per sweep so a noisy window can't sink one query's every rep)
    // and reports the BEST rep — standalone re-measurement of this suite
    // shows identical queries swinging 5× between adjacent runs on this
    // oversubscribed host, so single-shot numbers are not comparable
    // round-over-round.
    final case class QR(sec: Double, rows: Long, ok: Boolean)
    val queryReps = sys.env.getOrElse("SPARK_GRAFT_QUERY_REPS", "2").toInt
    // fixed-work probes bracketing the sweeps: the best (least contended)
    // probe is this window's time unit, so round-over-round comparisons
    // divide out the co-tenant regime (r3 saw untouched queries swing 2-5×
    // between rounds purely from host load — raw seconds don't compare)
    // scheduler-latency probe: median wall time of a trivial 1-row Spark
    // job — the third independent host dimension. The 2026-08-20 analysis
    // found a regime where CPU and bandwidth probes both read FASTER than
    // a 3-day-old record while every many-small-job query (graph
    // fixpoints, iterative dedup evals) ran 1.5-2× slower and pure-compute
    // queries ran faster: per-job round-trip latency had drifted, which
    // neither probe measures. Recorded per run so future regression gates
    // can normalize job-bound queries by it.
    def jobLatencyProbe(): Double = {
      (1 to 3).foreach(_ => spark.range(1).count())
      val ts = (1 to 11).map { _ =>
        val t0 = System.nanoTime()
        spark.range(1).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(ts.length / 2)
    }
    val probeBefore = spinSeconds(1)
    val bwBefore = bwProbeSec()
    val jobBefore = jobLatencyProbe()
    val sweeps = (1 to queryReps).map { _ =>
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        val (rows, ok) =
          try (fn(spark, sfDir).count(), true)
          catch { case _: Throwable => (-1L, false) }
        name -> QR((System.nanoTime() - t0) / 1e9, rows, ok)
      }
    }
    val probeAfter = spinSeconds(1)
    val bwAfter = bwProbeSec()
    val jobAfter = jobLatencyProbe()
    val probeSec = math.min(probeBefore, probeAfter)
    val bwSec = math.min(bwBefore, bwAfter)
    val jobSec = math.min(jobBefore, jobAfter)
    val results = sweeps.transpose.map { reps =>
      val name = reps.head._1
      // a query must succeed in EVERY sweep to count as ok; the reported
      // time is the best SUCCESSFUL rep when any succeeded — a sweep that
      // threw fast must not donate its near-zero timing to the headline
      // total (ADVICE r3 #1)
      val ok = reps.forall(_._2.ok)
      val okReps = reps.map(_._2).filter(_.ok)
      val best = (if (okReps.nonEmpty) okReps else reps.map(_._2)).minBy(_.sec)
      name -> QR(best.sec, best.rows, ok)
    }
    // normalized per-query times (probe units) + regression list vs the most
    // recent prior artifact that actually carries a comparable
    // queries_normalized map. Candidates: BENCH_LOCAL.json (the full JSON
    // line this main wrote last run — read BEFORE we overwrite it below) and
    // the driver's BENCH_r*.json wrappers, whose "tail" field holds the LAST
    // 2000 chars of stdout with quotes ESCAPED — so they must be unescaped
    // first and may be front-truncated past queries_normalized entirely
    // (BENCH_r04.json is; ADVICE r4 #1). extractPrevNormalized handles both
    // shapes and gates on the sf matching, so a local sf0.01 run never
    // "regresses" against a driver sf0.1 artifact.
    val normalized = results.map { case (k, v) => k -> v.sec / probeSec }
    val candidates = Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
      // BENCH_QUERYONLY.json joins the candidate set: the regression gate
      // hunts CODE-caused slowdowns, so the most RECENT comparable artifact
      // is the right reference — a same-day query-only sweep shares the
      // host regime, where a days-old full record confounds regime drift
      // with regressions (observed 2026-08-20: median 1.22x uniform shift
      // vs a 3-day-old record while pure-compute queries ran FASTER)
      .filter(f => f.getName == "BENCH_LOCAL.json" ||
        f.getName == "BENCH_QUERYONLY.json" ||
        f.getName.matches("BENCH_r\\d+\\.json"))
      .sortBy(-_.lastModified())
    val (prevFile, prevNorm, prevRaw, prevBw, prevJob) =
      candidates.iterator.map { f =>
        val txt = try new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
          catch { case _: Throwable => "" }
        (f, extractPrevNormalized(txt, sfDir), extractPrevQueriesRaw(txt, sfDir),
          extractPrevBwProbe(txt, sfDir), extractPrevJobProbe(txt, sfDir))
      }.collectFirst { case (f, m, raw, bw, jl) if m.nonEmpty =>
        (Some(f), m, raw, bw, jl)
      }.getOrElse((None, Map.empty[String, Double], Map.empty[String, Double],
        Option.empty[Double], Option.empty[Double]))
    // regression = BOTH 1.5× the prior normalized time AND ≥0.5 probe-units
    // absolute growth: sub-second queries are best-of-2 jitter samples, and
    // a noisy query leg was flagging 100+ ~0.1s queries whose "regression"
    // was scheduler noise, burying any real one (observed 2026-08-20 run).
    // DUAL-UNIT gate: the CPU spin probe normalizes compute speed but NOT
    // memory bandwidth, and the two regimes move independently on this
    // host (observed: probe_sec 0.848→0.76 while bw_probe_sec 0.044→0.066
    // — every "regressed" query was shuffle/bandwidth-bound). A query only
    // counts as regressed if it ALSO regressed in bandwidth-probe units;
    // artifacts without a bw probe fall back to the CPU-only gate.
    def unitRegressed(prevProbe: Option[Double], curProbe: Double)
                     (k: String, curSec: Double): Boolean =
      (prevProbe, prevRaw.get(k)) match {
        case (Some(pp), Some(ps)) if pp > 0 && curProbe > 0 =>
          curSec / curProbe > (ps / pp) * 1.5
        case _ => true // no evidence in this unit → defer to the others
      }
    // TRIPLE-UNIT: a flag must survive normalization by the CPU spin, the
    // bandwidth probe, AND the scheduler-latency probe — the three host
    // dimensions observed moving independently (2026-08-20: cpu/bw both
    // FASTER than a 3-day-old record while job latency drifted and every
    // many-small-job query read 1.5-2x "slower" — pure regime, zero code)
    def bwRegressed(k: String, curSec: Double): Boolean =
      unitRegressed(prevBw, bwSec)(k, curSec)
    def jobRegressed(k: String, curSec: Double): Boolean =
      unitRegressed(prevJob, jobSec)(k, curSec)
    val resultsMap = results.toMap
    val regressions = normalized.collect {
      case (k, v) if prevNorm.get(k).exists(p => v > p * 1.5 && v - p >= 0.5) &&
        bwRegressed(k, resultsMap(k).sec) &&
        jobRegressed(k, resultsMap(k).sec) => k
    }.toSeq.sorted

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"${v.sec}%.3f" }
      .mkString("{", ",", "}")
    val qrows = results.map { case (k, v) => "\"" + k + "\":" + v.rows }
      .mkString("{", ",", "}")
    val failed = results.filter(!_._2.ok).map(r => "\"" + r._1 + "\"").mkString("[", ",", "]")
    val total = results.map(_._2.sec).sum

    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"""" +
        s""","query_rows":$qrows,"queries_failed":$failed,"query_reps":$queryReps""" +
        f""","probe_sec":$probeSec%.3f,"bw_probe_sec":$bwSec%.3f,"job_probe_sec":$jobSec%.4f""" +
        s""","scaling_skipped":$skipScaling""" +
        s""","queries_normalized":${normalized.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")}""" +
        s""","bench_prev":${prevFile.map(f => "\"" + f.getName + "\"").getOrElse("null")}""" +
        s""","prev_bw_probe_sec":${prevBw.map(v => f"$v%.3f").getOrElse("null")}""" +
        s""","query_regressions":${regressions.map("\"" + _ + "\"").mkString("[", ",", "]")}""" +
        f""","extract_docs":$nDocs,"extract_pages":$p4N,"extract_chars":$c4N""" +
        s""","scaling_levels":"local[$levelN]->local[$level4N]","scaling_reps":$rep""" +
        s""","scaling_quiet_pairs":${quietPairs.length}""" +
        s""","pair_effs":${scored.map(p => f"${p.eff}%.3f").mkString("[", ",", "]")}""" +
        s""","pair_noise":${pairs.map(p => f"[${p.noiseBefore}%.2f,${p.noiseMid}%.2f,${p.noiseAfter}%.2f]").mkString("[", ",", "]")}""" +
        s""","pair_bw":${pairs.map(p => f"[${p.bwBefore}%.3f,${p.bwMid}%.3f,${p.bwAfter}%.3f]").mkString("[", ",", "]")}""" +
        f""","bw_ref_sec":$bwMin%.3f,"bw_median_sec":$bwMedian%.3f""" +
        f""","host_noise_before":$noiseBefore%.2f,"host_noise_after":$noiseAfter%.2f""" +
        f""","extract_sec_n":$tN%.3f,"extract_sec_4n":$t4N%.3f""" +
        f""","extract_docs_per_sec_n":$thrN%.1f,"extract_docs_per_sec_4n":$thr4N%.1f""" +
        f""","html_docs_per_sec":$htmlThr%.1f,"render_docs_per_sec":$renderThr%.1f""" +
        f""","native_fused_speedup":$nativeFusedSpeedup%.2f""" +
        f""","scaling_efficiency_raw":$effMedian%.3f,"scaling_efficiency_ratemedian":$effRateMedian%.3f,"scaling_flagged":$effFlagged""" +
        f""","scaling_efficiency":$eff%.3f}"""
    println(json)
    // fallback artifact in case stdout is captured through a log wrapper;
    // query-only runs must not overwrite the scaling artifact of record
    val artifact = if (skipScaling) "BENCH_QUERYONLY.json" else "BENCH_LOCAL.json"
    try java.nio.file.Files.write(java.nio.file.Paths.get(artifact),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => () }
    spark.stop()
  }
}
