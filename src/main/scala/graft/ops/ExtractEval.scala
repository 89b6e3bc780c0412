package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.html.HtmlExtract

/** Extractor-quality evaluation: run the real HTML main-content extractor
  * over pages whose gold text is known, and score the per-document damage
  * with edit distance — the eval loop a Common-Crawl pipeline runs when it
  * changes boilerplate heuristics (compare new extractor output against a
  * frozen gold set; reference behavior contract: byte-identical text per
  * url, BASELINE.json north rule).
  *
  * Scale shape: the page synthesis and the parse are one narrow typed pass
  * (no shuffle — payloads are consumed where produced, the extraction
  * pipeline's own rule); the scoring column is Spark's codegen'd
  * `levenshtein`, bounded by capping gold at 240 chars (O(240²) per row,
  * constant). Nothing in the plan widens with corpus size.
  */
object ExtractEval {

  /** Synthetic eval corpus: each document's text (capped + trimmed) becomes
    * the gold main content of an HTML page with nav/footer boilerplate.
    * Docs on the `doc_id % 7 == 0` residue (when long enough) get a
    * DAMAGED embedding — last 20 chars replaced by a drift tail — so the
    * eval measures a known nonzero distance there and zero elsewhere.
    * Deterministic, replayable analytically in SQL. */
  def corpusAsPages(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, text) =>
      val payload = text.substring(0, math.min(240, text.length)).trim
      val embedded =
        if (id % 7 == 0 && payload.length > 60)
          payload.substring(0, payload.length - 20).replaceAll("\\s+$", "") +
            " extractor drift tail."
        else payload
      val html =
        s"""<html lang="en"><head><title>Doc $id</title></head><body>""" +
          """<nav><a href="/">Home</a> <a href="/all">All pages listing</a></nav>""" +
          s"""<main><p>$embedded</p></main>""" +
          """<footer>Footer boilerplate long enough to form its own block entirely.</footer>""" +
          "</body></html>"
      (id, payload, html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }.toDF("doc_id", "gold", "html")
  }

  /** Per-document extraction score: parse each page with the production
    * extractor, compare `mainText()` against gold. `lev` is the classic
    * Levenshtein distance (Spark built-in, codegen'd); `exact` flags
    * byte-identical recovery — the north rule's per-row invariant. */
  def evaluate(pages: DataFrame): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val extracted = pages.select(col("doc_id"), col("gold"), col("html"))
      .as[(Long, String, Array[Byte])]
      .map { case (id, gold, html) => (id, gold, HtmlExtract.parse(html).mainText()) }
      .toDF("doc_id", "gold", "extracted")
    extracted.select(
      col("doc_id"),
      length(col("gold")).cast("long").as("gold_len"),
      length(col("extracted")).cast("long").as("ext_len"),
      levenshtein(col("gold"), col("extracted")).cast("long").as("lev"),
      (levenshtein(col("gold"), col("extracted")) === 0).as("exact"))
  }
}
