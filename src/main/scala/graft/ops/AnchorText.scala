package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.spark.PageRow

/** Anchor-text aggregation: for each link TARGET, the top-k anchor strings
  * pointing at it with their counts — the classic web-corpus signal (a
  * page is well described by what other pages call it) used for retrieval
  * labels and query-document training pairs.
  *
  * Scale shape: two-phase. Phase 1 counts (dst, anchor) pairs — a plain
  * algebraic aggregate, so a hot target ("google.com" gets billions of
  * anchors) combines map-side before its single Exchange; anchors are
  * length-capped at the source so no row carries unbounded text. Phase 2
  * ranks WITHIN each dst over the already-counted table (≤ |distinct
  * (dst, anchor)| rows, not corpus-sized) and keeps rank ≤ k — the
  * count-then-rank shape, never collect_list of raw anchors.
  */
object AnchorText {

  /** (dst, anchor, n_refs, rank, n_anchor_variants) per target, rank ≤ k
    * by (count desc, anchor asc). Boilerplate placements excluded —
    * nav/footer anchors ("Home") describe the site chrome, not the
    * target; nofollow links are KEPT (the anchor still describes the
    * destination even when rank flow is disclaimed). */
  def topAnchors(links: Dataset[LinkGraph.LinkRow], k: Int, maxAnchorLen: Int = 100): DataFrame = {
    val counted = links.toDF()
      .where(!col("boilerplate") && length(trim(col("anchor"))) > 0)
      .select(col("dst"), substring(trim(col("anchor")), 1, maxAnchorLen).as("anchor"))
      .groupBy("dst", "anchor").agg(count(lit(1)).as("n_refs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("dst"))
      .orderBy(col("n_refs").desc, col("anchor").asc)
    counted
      .withColumn("rank", row_number().over(w))
      .withColumn("n_anchor_variants",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("dst"))))
      .where(col("rank") <= k)
  }

  /** Deterministic hub corpus: page p (on site{p%8}.example) links to hub
    * h = p%10 with slot anchor "hub anchor {p%3}" plus one unique
    * long-tail anchor "page {p} pick" — so each of the 10 hubs collects
    * ~n/30 refs per slot anchor and n/10 singleton variants, exercising
    * count ties (broken by anchor asc), the rank-≤-k cut, and the
    * variant count. Boilerplate nav links must not leak into anchors.
    * The DuckDB oracle regenerates the same arithmetic without parsing
    * HTML, pinning parse → resolve → trim → count end-to-end. */
  def synthHubCorpus(spark: SparkSession, nPages: Int): Dataset[PageRow] = {
    import spark.implicits._
    spark.range(nPages).map { pL =>
      val p = pL.toInt
      val d = p % 8
      val h = p % 10
      val url = s"https://site$d.example/a/p$p"
      val html =
        s"""<html><head><title>Page $p</title></head><body>
           |<nav><a href="/a/p$p">Home</a></nav>
           |<p>See <a href="https://hub.example/h$h">  hub anchor ${p % 3}  </a>
           |and <a href="https://hub.example/h$h">page $p pick</a>.</p>
           |</body></html>""".stripMargin
      PageRow(url, new java.sql.Timestamp(1704067200000L + p * 1000L),
        html.getBytes(java.nio.charset.StandardCharsets.UTF_8), null, "en")
    }
  }
}
