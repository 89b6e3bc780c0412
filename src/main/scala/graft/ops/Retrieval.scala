package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Retrieval scoring over the corpus — BM25-shaped ranking of documents
  * against a small query set, the lookup side of the inverted index and
  * the relevance signal for query-document training pairs.
  *
  * Arithmetic is INTEGER end-to-end (micro-unit scores, floor division),
  * like domain_rank's PageRank: per-term contributions are quantized
  * before summing, so scores are order-independent — identical bits on
  * any partitioning or engine — which is what makes an exact DuckDB
  * oracle possible where float BM25 would drift ULPs. The idf is the
  * RATIONAL variant idf_u = (10^6·(2(N−df)+1)) // (2·df+1) — the
  * Robertson-Sparck-Jones argument without the log — monotone in df, so
  * ranking behavior matches BM25's idf ordering; documented as a variant.
  *
  * Scale shape: per-doc term frequencies are counted IN-ROW (one typed
  * flatMap, no corpus shuffle), filtered to query terms immediately — so
  * everything downstream is bounded by Σ df(query terms), not corpus
  * size. df and idf for the ≤|queries|·|terms| query vocabulary
  * broadcast back; the only data-sized shuffle is the (query_id, doc_id)
  * partial-aggregated score sum, and the top-k window runs per query on
  * scored rows only.
  */
object Retrieval {

  /** (query_id, doc_id, score_micro, rank ≤ k), ranked per query by
    * (score desc, doc_id asc). `queries` must be small (collected to
    * build the term filter). Query terms are deduplicated. */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
               k1Milli: Long = 1200, bMilli: Long = 750): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    val qterms = queries.select(col("query_id"),
        explode(array_distinct(filter(split(col("qtext"), " ", -1),
          t => length(t) > 0))).as("term"))
      .as[(Long, String)].collect()
    val termSet = qterms.map(_._2).toSet

    // one narrow pass: per-doc length + in-row term counts, query terms only
    val tfq = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val toks = if (text == null) Array.empty[String]
            else text.split(" ", -1).filter(_.nonEmpty)
          val dl = toks.length.toLong
          val counts = new scala.collection.mutable.HashMap[String, Long]()
          toks.foreach { t => if (termSet.contains(t)) counts.update(t, counts.getOrElse(t, 0L) + 1L) }
          counts.iterator.map { case (t, c) => (id, dl, t, c) }
        }
      }.toDF("doc_id", "dl", "term", "tf")

    // corpus stats ride a 2-long aggregate, never a collect of rows
    val st = docs.select(
      count(lit(1)).as("n"),
      sum(size(filter(split(col("text"), " ", -1), t => length(t) > 0))).as("tdl"))
      .head()
    val nDocs = st.getLong(0)
    val avgdlMilli = math.max(1L, st.getLong(1) * 1000L / math.max(1L, nDocs))

    // df over query terms only (tiny shuffle), idf broadcast back
    val qdf = tfq.groupBy("term").agg(count(lit(1)).as("df"))
      .withColumn("idf_micro",
        expr(s"(1000000L * (2 * (${nDocs}L - df) + 1)) div (2 * df + 1)"))
    val qjoin = broadcast(qdf.join(
      qterms.toSeq.toDF("query_id", "term"), Seq("term")))

    val scored = tfq.join(qjoin, Seq("term"))
      .withColumn("norm_m",
        expr(s"(1000 - ${bMilli}L) + ((${bMilli}L * dl * 1000) div ${avgdlMilli}L)"))
      .withColumn("contrib",
        expr(s"(idf_micro * ((tf * (${k1Milli}L + 1000) * 1000) div " +
          s"(tf * 1000 + ((${k1Milli}L * norm_m) div 1000)))) div 1000"))
      .groupBy("query_id", "doc_id")
      .agg(sum("contrib").as("score_micro"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score_micro").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Deterministic query set over the corpus vocabulary. */
  def synthQueries(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (0L, "table scan fast"),
      (1L, "window agg group"),
      (2L, "customer query join"),
      (3L, "stream batch merge"),
      (4L, "vector hash sort")).toDF("query_id", "qtext")
  }
}
