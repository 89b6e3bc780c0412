package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Recrawl scheduling — the feedback loop that closes the crawl cycle:
  * estimate each url's change rate from its observed snapshot history and
  * rank urls within each domain so the next crawl round spends its
  * per-domain politeness budget on the pages most likely to have changed
  * (Cho & Garcia-Molina, "Effective Page Refresh Policies for Web
  * Crawlers", TODS 2003 — frequency-based refresh ordering).
  *
  * Integer arithmetic end-to-end (Laplace-smoothed change rate in
  * micro-units, floor division), so priorities are bit-identical on any
  * partitioning or engine — the same determinism discipline as PageRank
  * and BM25 here.
  *
  * Scale shape: the change count is a per-url lag comparison — the window
  * partitions by url over K snapshot rows (K = observation count, a small
  * constant), never by domain over the corpus; the per-domain ranking
  * window then runs on url-level AGGREGATED rows (one per url), and only
  * the top-k survive. No payload ever shuffles: history rows carry url +
  * md5 only.
  */
object Recrawl {

  /** Deterministic K-snapshot history synthesis (the corpus is
    * single-snapshot): per canonical url (first doc_id wins, mirroring
    * canonical dedup), content version at snapshot k is
    * (k * (1 + doc_id%5)) / 4 floor — yielding 0..3 changes across 4
    * snapshots depending on doc_id%5, hash = md5(url '#' version).
    * Mirrored verbatim in the DuckDB oracle. */
  def synthHistory(normalized: DataFrame, nSnaps: Int = 4): DataFrame =
    normalized.groupBy(col("url_canon"))
      .agg(min(col("doc_id")).as("d"), min(col("domain")).as("domain"))
      .withColumn("snap_k", explode(sequence(lit(0), lit(nSnaps - 1))))
      .select(
        col("url_canon"), col("domain"), col("snap_k").cast("long").as("snap_k"),
        md5(concat(col("url_canon"), lit("#"),
          floor(col("snap_k") * (lit(1) + col("d") % 5) / 4).cast("long"))).as("content_md5"))

  /** Change-rate estimate + per-domain recrawl ranking.
    * Input: (url_canon, domain, snap_k, content_md5); output one row per
    * (domain, url) in the domain's top-k:
    * priority_micro = floor((2*n_changes + 1) * 10^6 / (2*n_obs)) — the
    * Laplace-smoothed fraction of observation gaps that changed, in
    * micro-units. Ties rank deterministically by url. */
  def schedule(history: DataFrame, topK: Int = 2): DataFrame = {
    val byUrl = Window.partitionBy(col("url_canon")).orderBy(col("snap_k"))
    val per = history
      .withColumn("prev", lag(col("content_md5"), 1).over(byUrl))
      .groupBy(col("url_canon"), col("domain"))
      .agg(
        count(lit(1)).as("n_obs"),
        sum(when(col("prev").isNotNull && col("prev") =!= col("content_md5"), 1L)
          .otherwise(0L)).as("n_changes"))
      .withColumn("priority_micro",
        floor((col("n_changes") * 2 + 1) * 1000000L / (col("n_obs") * 2)).cast("long"))
    val byDomain = Window.partitionBy(col("domain"))
      .orderBy(col("priority_micro").desc, col("url_canon"))
    per.withColumn("rnk", row_number().over(byDomain).cast("long"))
      .where(col("rnk") <= topK)
      .select("domain", "url_canon", "n_obs", "n_changes", "priority_micro", "rnk")
  }

  /** Deterministic per-domain robots.txt with a Crawl-delay directive
    * (delay = 1 + len(domain) mod 5 seconds) — the politeness input the
    * fetch planner consumes. Mirrored in the DuckDB oracle (the parse of
    * a synthesized text equals the formula by construction, so the
    * oracle pins parse + plan end-to-end). */
  def synthRobotsDelay(domains: DataFrame): DataFrame =
    domains.select(col("domain"),
      concat(lit("User-agent: *\nCrawl-delay: "),
        (length(col("domain")) % 5 + 1).cast("string")).as("robots_txt"))

  /** Parse each domain's Crawl-delay for `agent` (RFC 9309 group
    * selection; default 1 s when absent). Robots files are per-domain —
    * a tiny table — so this typed pass is frontier-sized, never
    * corpus-sized. */
  def parseDelays(robots: DataFrame, agent: String): DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots.select(col("domain"), col("robots_txt")).as[(String, String)]
      .map { case (d, txt) => (d, Robots.crawlDelayFor(txt, agent).getOrElse(1L)) }
      .toDF("domain", "delay_s")
  }

  /** The fetch plan: recrawl-ranked urls → worker queues with
    * politeness-spaced fetch offsets. Queue = hash(domain) mod workers
    * (domain affinity keeps one domain's connections on one worker);
    * offset = (rank−1) · crawl-delay — the domain's pages fetch
    * delay-spaced in priority order. Delays join as a BROADCAST (one row
    * per domain); the only corpus-sized state is the already-ranked
    * schedule rows. */
  def fetchPlan(sched: DataFrame, delays: DataFrame, workers: Int): DataFrame =
    sched.join(broadcast(delays), Seq("domain"))
      .select(
        Sampling.md5Mod(col("domain"), workers).as("queue"),
        col("domain"), col("url_canon"), col("rnk"), col("delay_s"),
        ((col("rnk") - 1) * col("delay_s") * 1000).as("fetch_offset_ms"))
}
