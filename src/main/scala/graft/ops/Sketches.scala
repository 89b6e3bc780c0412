package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable sketch operators — the pre-aggregation primitives a 100-TB
  * corpus pipeline leans on when exact per-key state no longer fits:
  * distinct-count sketches per partition key (KMV) and frequent-item
  * detection (Misra-Gries candidates + an exact confirmation pass).
  *
  * Both are deterministic end to end — the KMV hash is the md5 convention
  * DuckDB can replay ([[Sampling.md5Mod]]) and the heavy-hitter output is
  * EXACT counts (the sketch only proposes candidates) — so both carry
  * full value-level oracles, unlike the usual "approximately right"
  * sketch demo. */
object Sketches {

  /** Bloom-filter membership for the crawl seen-set: k md5-derived bit
    * positions per key over an m-bit domain. The bit array is held in its
    * SPARSE form — the DISTINCT set of inserted positions, at most m rows
    * — which (a) is exactly what a bitmap is semantically, (b) broadcasts
    * to every probe task (m is a design constant, 2^11–2^27, independent
    * of corpus size), and (c) makes the whole structure replayable in
    * DuckDB SQL, so the false-positive behavior itself is oracle-checked
    * rather than asserted from the textbook formula.
    *
    * Scale shape: inserts are a map-side explode (k rows per key) into
    * one distinct-aggregation bounded by m; probes never shuffle — they
    * hash-join the broadcast position set and reduce `hits == k` per key
    * with partial aggregation. Zero false negatives by construction (the
    * spec asserts it); false positives are measured, not estimated.
    *
    * Output: one row per probe key — (key, bloom_positive). */
  def bloomMembership(inserted: DataFrame, probes: DataFrame,
                      mBits: Long, k: Int): DataFrame = {
    require(k >= 1 && mBits >= 2, "need k >= 1 hash functions, m >= 2 bits")
    def positions(key: org.apache.spark.sql.Column) =
      array((0 until k).map(i =>
        Sampling.md5Mod(concat(lit(s"bloom$i:"), key), mBits)): _*)
    val bits = inserted.select(explode(positions(col("key"))).as("pos")).distinct()
    probes.select(col("key"), explode(positions(col("key"))).as("p"))
      .join(broadcast(bits), col("p") === col("pos"), "left")
      .groupBy(col("key"))
      .agg((count(col("pos")) === k).as("bloom_positive"))
  }

  /** Cross-source content-overlap report: per source pair, the k-seed
    * md5-minhash SIGNATURE-agreement estimate of Jaccard next to the
    * exact set Jaccard — the audit a corpus mixer runs before weighting
    * sources ("how much of src2 is already in src0?"), with the estimator
    * error measurable in the same row. Elements are distinct md5(text)
    * per source; per seed s the source's signature is min over elements
    * of md5Mod(s:element) — the identical convention DuckDB replays with
    * `md5_number_upper`, so the ESTIMATE itself is oracle-checked.
    *
    * Scale shape: elements dedup in one shuffle; signatures are a k-row
    * broadcast-seeds explode + one (source, seed) min aggregation —
    * k·#sources rows total after partial agg; everything downstream
    * (pair frame, matches, exact intersection on the deduped element
    * keys) is source-vocabulary-sized or one element-keyed join. */
  def sourceOverlap(corpus: DataFrame, k: Int = 32): DataFrame = {
    val spark = corpus.sparkSession
    val el = corpus.select(col("source"), md5(col("text")).as("e")).distinct()
      .localCheckpoint(true)
    val seeds = spark.range(k).select(col("id").as("seed"))
    val sig = el.crossJoin(broadcast(seeds))
      .select(col("source"), col("seed"),
        Sampling.md5Mod(concat(col("seed"), lit(":"), col("e")), KmvDomain).as("h"))
      .groupBy(col("source"), col("seed")).agg(min(col("h")).as("mh"))
    val matches = sig.as("x")
      .join(sig.as("y"),
        col("x.seed") === col("y.seed") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
      .agg(sum(when(col("x.mh") === col("y.mh"), 1L).otherwise(0L)).as("sig_match"))
    val sizes = el.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val inter = el.as("p")
      .join(el.as("q"), col("p.e") === col("q.e") && col("p.source") < col("q.source"))
      .groupBy(col("p.source").as("src_a"), col("q.source").as("src_b"))
      .agg(count(lit(1)).as("inter"))
    sizes.as("a").join(sizes.as("b"), col("a.source") < col("b.source"))
      .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"))
      .join(inter, Seq("src_a", "src_b"), "left").na.fill(0L, Seq("inter"))
      .join(matches, Seq("src_a", "src_b"), "left").na.fill(0L, Seq("sig_match"))
      .withColumn("n_union", col("n_a") + col("n_b") - col("inter"))
      .withColumn("exact_permille", expr("CAST(inter * 1000 DIV n_union AS BIGINT)"))
      .withColumn("est_permille", expr(s"CAST(sig_match * 1000 DIV $k AS BIGINT)"))
  }

  /** KMV hash domain: 2^40. Small enough that (k−1)·2^40 stays far inside
    * int64 for the estimator's integer division, large enough that
    * same-domain collisions are ~n²/2^41 (negligible, and deterministic —
    * the oracle replays the identical hash). */
  val KmvDomain: Long = 1L << 40

  /** Bounded k-minimum-values buffer: a sorted ascending list of at most
    * k DISTINCT hashes. Merge is a sorted-list union truncated at k, so
    * the sketch is associative/commutative — the property that lets
    * map-side partial aggregation keep the shuffle at O(k) longs per
    * (task, key) instead of one row per url. */
  private final class KmvAgg(k: Int)
      extends Aggregator[Long, List[Long], Seq[Long]] {
    override def zero: List[Long] = Nil
    override def reduce(b: List[Long], h: Long): List[Long] = {
      if (b.lengthCompare(k) >= 0 && h >= b.last) b
      else {
        val (pre, post) = b.span(_ < h)
        if (post.nonEmpty && post.head == h) b // distinct values only
        else (pre ::: h :: post).take(k)
      }
    }
    override def merge(b1: List[Long], b2: List[Long]): List[Long] = {
      val out = List.newBuilder[Long]
      var (l, r, n) = (b1, b2, 0)
      while (n < k && (l.nonEmpty || r.nonEmpty)) {
        if (r.isEmpty || (l.nonEmpty && l.head < r.head)) {
          out += l.head
          if (r.nonEmpty && r.head == l.head) r = r.tail
          l = l.tail
        } else if (l.isEmpty || r.head < l.head) { out += r.head; r = r.tail }
        else { out += l.head; l = l.tail; r = r.tail } // equal heads: once
        n += 1
      }
      out.result()
    }
    override def finish(b: List[Long]): Seq[Long] = b
    override def bufferEncoder: Encoder[List[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Per-domain distinct-URL estimate from a k-minimum-values sketch
    * (Bar-Yossef et al., RANDOM 2002): hash every canonical url into
    * [0, 2^40), keep the k smallest distinct hashes per domain, and
    * estimate |distinct| = (k−1)·2^40 div kth_min once the buffer is
    * full (exact buffer size below k). All integer arithmetic — the
    * DuckDB oracle replays hash, kth order statistic, and estimator
    * bit-for-bit.
    *
    * Scale shape: the hash is one codegen'd projection on the scan; the
    * sketch is a typed Aggregator with O(k) state combined map-side, so
    * one Exchange carries ≤ k longs per (task, domain) — the shape that
    * replaces `count(DISTINCT url)`'s full url shuffle at 10^12 rows.
    * `n_exact` (the validation column) is the one non-sketch agg; a
    * production run drops it. */
  def kmvDistinct(normalized: DataFrame, k: Int): DataFrame = {
    val kmv = udaf(new KmvAgg(k))
    normalized
      .select(col("domain"), col("url_canon"),
        Sampling.md5Mod(col("url_canon"), KmvDomain).as("h"))
      .groupBy("domain")
      .agg(countDistinct(col("url_canon")).as("n_exact"),
           kmv(col("h")).as("mins"))
      .select(col("domain"), col("n_exact"),
        size(col("mins")).cast("long").as("n_sketch"),
        element_at(col("mins"), -1).as("kth_min"),
        when(size(col("mins")) < k, size(col("mins")).cast("long"))
          .otherwise(expr(s"CAST(${k - 1} AS BIGINT) * $KmvDomain div element_at(mins, -1)"))
          .as("est_distinct"))
  }

  /** Misra-Gries frequent-items summary of one iterator with k counters:
    * any value with partition frequency > n_p/k survives. Returned as the
    * surviving candidate set (counts are NOT trustworthy — the exact pass
    * re-counts). */
  private[ops] def misraGries(it: Iterator[String], k: Int): Iterator[String] = {
    val counters = new scala.collection.mutable.HashMap[String, Long]
    while (it.hasNext) {
      val v = it.next()
      counters.get(v) match {
        case Some(c) => counters.update(v, c + 1)
        case None =>
          if (counters.size < k) counters.update(v, 1L)
          else {
            // decrement-all step; drop zeroed counters
            val dead = List.newBuilder[String]
            counters.foreach { case (key, c) =>
              if (c == 1L) dead += key else counters.update(key, c - 1)
            }
            dead.result().foreach(counters.remove)
          }
      }
    }
    counters.keysIterator.toVector.iterator
  }

  /** Exact heavy hitters over a single string column `v` by the classic
    * two-pass design: (1) per-partition Misra-Gries with k counters —
    * by the averaging argument, any value with GLOBAL frequency > n/k
    * exceeds n_p/k in at least one partition, so the union of partition
    * survivors is a guaranteed superset of the true heavy hitters;
    * (2) an exact count restricted to that candidate set, filtered at
    * count·k > n. Output is exact (value, cnt) — no approximation
    * survives to the result, which is what makes it oracle-able.
    *
    * Scale shape: pass 1 is a narrow mapPartitions emitting ≤ k strings
    * per task (no shuffle); the candidate set (≤ k·tasks values) collects
    * to the driver and ships back as an `isin` literal inside the pass-2
    * scan filter, so the only Exchange aggregates candidate rows only.
    * At 10^12 rows with k=16 that Exchange carries a few thousand
    * partial counts — versus a full groupBy over every distinct value. */
  def heavyHitters(values: DataFrame, k: Int): DataFrame = {
    val spark = values.sparkSession
    import spark.implicits._
    val vs = values.select(col("v").cast("string")).as[String]
    val candidates = vs.mapPartitions(it => misraGries(it, k))
      .distinct().collect().toSeq
    val n = vs.count()
    // empty-input edge: constant-false filter → empty result, right schema
    val candFilter =
      if (candidates.isEmpty) lit(false) else col("v").isin(candidates: _*)
    values.select(col("v").cast("string").as("v"))
      .where(candFilter)
      .groupBy("v").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * k > n)
  }

  /** HyperLogLog registers per domain, INTEGER-EXACT end to end (Flajolet
    * et al. 2007, m = 64): register j = h mod 64, rank ρ = leading-zero
    * count of the remaining 34 hash bits + 1 (= 35 − bitwidth, computed
    * from `length(bin(w))` — string built-ins, no float log), registers
    * max-merged, harmonic sum held SCALED as S = Σ_j 2^(35−M_j) (absent
    * registers contribute 2^35), raw estimate α·m²·2^35 div (1000·S) with
    * α = 0.709‰-precision. The float small-range (linear-counting)
    * correction is deliberately left to the consumer — `v_zero` (empty
    * registers) ships alongside so it CAN be applied — because the sketch
    * STATE and the raw estimator are what must merge and replay exactly.
    *
    * Why next to [[kmvDistinct]]: HLL is the industry default (constant
    * 64-register state vs KMV's k values; union-mergeable by register
    * max, which plain SQL can do across shards/snapshots). Spark's own
    * approx_count_distinct is HLL++ but not oracle-able; this one is.
    *
    * Scale shape: two algebraic rollups — (domain, j) max ρ, then a
    * ≤64-rows-per-domain harmonic sum — both map-side combined; the
    * widest shuffle row is (domain, j, ρ): ~20 bytes. */
  private val HllM = 64

  /** (ρ-ranked register rows before the max-merge): one row per input row,
    * (groupCols..., j, rho). */
  private def hllRho(urls: DataFrame, groupCols: Seq[String]): DataFrame =
    urls
      .select(col("*"), Sampling.md5Mod(col("url_canon"), KmvDomain).as("h"))
      .select(groupCols.map(col) :+ expr(s"h % $HllM").as("j") :+
        expr(s"h div $HllM").as("w"): _*)
      .select(groupCols.map(col) :+ col("j") :+
        when(col("w") === 0L, lit(35L))
          .otherwise(lit(35L) - length(bin(col("w"))).cast("long")).as("rho"): _*)

  /** Estimator over max-merged registers (groupCols..., j, mj) →
    * (groupCols..., v_zero, s_scaled, est_raw). */
  private def hllEstimate(regs: DataFrame, groupCols: Seq[String]): DataFrame =
    regs.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_regs"),
           sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(35 - mj AS INT))")).as("s_present"))
      .select(groupCols.map(col) :+
        (lit(HllM.toLong) - col("n_regs")).as("v_zero") :+
        (col("s_present") +
          (lit(HllM.toLong) - col("n_regs")) * (1L << 35)).as("s_scaled"): _*)
      .withColumn("est_raw",
        // α_64·m²·2^35 = 709·4096·2^35 / 1000, all inside int64
        expr(s"CAST(709 AS BIGINT) * ${HllM.toLong * HllM} * ${1L << 35} div (1000 * s_scaled)"))

  def hllDistinct(normalized: DataFrame): DataFrame =
    hllEstimate(
      hllRho(normalized.select(col("domain"), col("url_canon")), Seq("domain"))
        .groupBy("domain", "j").agg(max(col("rho")).as("mj")),
      Seq("domain"))
      .select("domain", "v_zero", "s_scaled", "est_raw")

  /** The property that justifies HLL at 10^12 rows: sketches MERGE by
    * register max — distinct counts over unions of shards/snapshots come
    * from stored sketch state, never a re-scan of the raw urls. Input:
    * (snap, domain, url_canon) rows for any number of snapshots. Output
    * per domain: the per-snapshot raw estimates and the union estimate
    * computed purely by max-merging the snapshot registers (bit-identical
    * to sketching the union directly — max is associative). Scale shape:
    * the same two algebraic rollups as [[hllDistinct]] plus one
    * register-table (≤ 64·|domains|·|snaps| rows) max-merge. */
  def hllMerge(snapUrls: DataFrame): DataFrame = {
    val perSnap = hllRho(snapUrls, Seq("snap", "domain"))
      .groupBy("snap", "domain", "j").agg(max(col("rho")).as("mj"))
      .localCheckpoint(true) // read 3×: snap labels, per-snap ests, union
    val ests = hllEstimate(perSnap, Seq("snap", "domain"))
      .select(col("snap"), col("domain"), col("est_raw"))
    val union = hllEstimate(
      perSnap.groupBy("domain", "j").agg(max(col("mj")).as("mj")),
      Seq("domain"))
      .select(col("domain"), col("est_raw").as("est_union"))
    // snapshot labels come from the data (a register-table rollup, tiny) —
    // a hardcoded pivot list would silently NULL any other labeling
    val snaps = perSnap.select(col("snap")).distinct()
      .collect().map(_.getString(0)).sorted
    val pivoted = ests.groupBy("domain")
      .pivot("snap", snaps.toSeq)
      .agg(first(col("est_raw")))
    snaps.foldLeft(pivoted)((df, s) =>
        df.withColumnRenamed(s, s"est_snap_$s"))
      .join(union, "domain")
  }

  /** Count-min sketch (Cormode & Muthukrishnan 2005): `depth` hash rows ×
    * `width` counters answer point frequency queries with one-sided error
    * (est ≥ exact, overcount ≤ colliding mass / width per row, min over
    * rows) in O(depth·width) state — the frequency sibling of [[hllDistinct]]
    * (distinct) and [[kmvDistinct]]. Cells merge by ADDITION, so shard
    * sketches sum into the corpus sketch (SketchSpec proves it cell-wise).
    *
    * Hashes are the repo's DuckDB-replayable md5 convention
    * (`md5_number_upper(j || ':' || key) % width`), so the whole sketch —
    * cells AND estimates — carries a value-level oracle instead of an
    * "approximately right" demo. Scale shape: one exact per-key rollup
    * (map-side combined — the same shuffle any frequency query pays), a
    * depth×width cell table built from per-KEY counts (never one row per
    * occurrence), and a broadcast of the ≤ depth·width cells back onto the
    * keys. At 10^12 rows the cell table is still 256 longs. */
  def countMin(keyed: DataFrame, depth: Int = 4, width: Long = 64L): DataFrame = {
    val keyCells = countMinKeyCells(keyed, depth, width)
    val cells = keyCells.groupBy(col("j"), col("cell"))
      .agg(sum(col("exact")).as("c"))
    keyCells.join(broadcast(cells), Seq("j", "cell"))
      .groupBy(col("key"), col("exact"))
      .agg(min(col("c")).as("est"))
      .select(col("key"), col("exact"), col("est"),
        (col("est") - col("exact")).as("overcount"))
  }

  /** Per-key exact counts with their `depth` cell coordinates — the input
    * both to the cell table and to estimation; exposed so SketchSpec can
    * prove the additive-merge law on the cell tables themselves. */
  private[ops] def countMinKeyCells(keyed: DataFrame, depth: Int,
                                    width: Long): DataFrame =
    keyed.groupBy(col("key")).agg(count(lit(1)).as("exact"))
      .select(col("key"), col("exact"),
        explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .withColumn("cell",
        Sampling.md5Mod(concat(col("j").cast("string"), lit(":"), col("key")), width))

  /** The depth×width cell table alone (for shard-merge composition). */
  def countMinCells(keyed: DataFrame, depth: Int = 4, width: Long = 64L): DataFrame =
    countMinKeyCells(keyed, depth, width)
      .groupBy(col("j"), col("cell")).agg(sum(col("exact")).as("c"))

  /** Quantile-hash-sample domain (2^20) and keep-threshold (domain/8 → a
    * deterministic 1-in-8 Bernoulli sample by item hash). */
  val QsDomain: Long = 1L << 20
  val QsKeep: Long = QsDomain / 8

  /** Per-key quantile estimation from a HASH-SAMPLE — the deterministic
    * alternative to KLL/GK for an oracle-able pipeline: keep exactly the
    * rows whose item-hash falls under [[QsKeep]] (a partition-invariant,
    * merge-order-free rule: the "sketch" of a union is the union of
    * sketches by construction, which randomized-compaction sketches
    * cannot promise), sort the per-key sample, and read quantiles at the
    * ceil-rank index. Estimates sit within the usual Bernoulli-sample
    * rank error (O(1/√(n/8)) ranks) but are BIT-DETERMINISTIC — the same
    * value on any partitioning, any engine — so DuckDB replays hash,
    * sample, and index selection exactly.
    *
    * `p*_exact` columns are the validation aggregate (full per-key sort),
    * the `n_exact` analog in [[kmvDistinct]]: a production run drops them
    * and shuffles ONLY the ~n/8 sampled longs per key. Empty samples
    * (tiny keys) yield null estimates rather than ANSI index errors.
    *
    * Input: (key, item, v). Output: quantiles at p50/p90/p99. */
  def quantileByHashSample(vals: DataFrame): DataFrame = {
    def qAt(arr: String, n: String, permille: Int, out: String) =
      expr(s"CASE WHEN size($arr) > 0 THEN element_at($arr, CAST(($n * $permille + 999) div 1000 AS INT)) END AS $out")
    vals
      .select(col("key"), col("v").cast("long").as("v"),
        Sampling.md5Mod(concat(lit("qs:"), col("item").cast("string")), QsDomain)
          .as("h"))
      .groupBy("key")
      .agg(count(lit(1)).as("n_rows"),
        sort_array(collect_list(when(col("h") < QsKeep, col("v")))).as("samp"),
        sort_array(collect_list(col("v"))).as("allv"))
      .select(col("key"), col("n_rows"),
        size(col("samp")).cast("long").as("sample_n"),
        qAt("samp", "size(samp)", 500, "p50_est"),
        qAt("samp", "size(samp)", 900, "p90_est"),
        qAt("samp", "size(samp)", 990, "p99_est"),
        qAt("allv", "n_rows", 500, "p50_exact"),
        qAt("allv", "n_rows", 900, "p90_exact"),
        qAt("allv", "n_rows", 990, "p99_exact"))
  }
}
