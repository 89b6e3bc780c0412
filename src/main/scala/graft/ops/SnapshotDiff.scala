package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Crawl snapshot diffing — classify every url across two crawl rounds as
  * added / removed / changed / unchanged by content hash. The change feed
  * drives recrawl scheduling (changed urls refresh sooner) and
  * incremental corpus updates (only added+changed re-enter the pipeline,
  * the complement of incremental-snapshot dedup).
  *
  * Scale shape: ONE full-outer hash join on url, carrying (url, md5)
  * pairs only — never payloads. On bucketed snapshot tables (both sides
  * bucketBy(url)) the join is Exchange-free, the shape BucketedJoinSpec
  * demonstrates; otherwise it is a single well-partitioned shuffle. The
  * domain rollup is algebraic and reuses the url partitioning's
  * map-side combine. */
object SnapshotDiff {

  /** (url, status) for every url present in either snapshot.
    * Inputs: (url, content_md5). */
  def diff(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("url"), col("content_md5").as("md5_a"))
      .join(b.select(col("url"), col("content_md5").as("md5_b")), Seq("url"), "full_outer")
      .select(col("url"),
        when(col("md5_a").isNull, "added")
          .when(col("md5_b").isNull, "removed")
          .when(col("md5_a") === col("md5_b"), "unchanged")
          .otherwise("changed").as("status"))

  /** Per-domain change rollup over a diff result. */
  def domainSummary(diffed: DataFrame): DataFrame = {
    val spark = diffed.sparkSession
    graft.functions.NativeRegistry.register(spark)
    diffed.withColumn("domain", expr("url_domain_native(url)"))
      .groupBy("domain", "status").agg(count(lit(1)).as("n"))
  }

  /** Deterministic snapshot pair over the documents table: snapshot A =
    * docs [0, n−50), B = docs [50, n); within the overlap, docs with
    * doc_id % 7 == 0 carry a different hash in B (content changed). So
    * removed = [0,50), added = [n−50,n), changed = overlap ∩ 7ℤ. */
  def synthSnapshots(docs: DataFrame): (DataFrame, DataFrame) = {
    val n = docs.count()
    val urled = docs.select(
      concat(lit("https://site"), col("doc_id") % 8, lit(".example/a/p"), col("doc_id")).as("url"),
      col("doc_id"), col("text"), md5(col("text").cast("binary")).as("content_md5"))
    val a = urled.where(col("doc_id") < n - 50).select("url", "content_md5")
    val b = urled.where(col("doc_id") >= 50)
      .select(col("url"),
        when(col("doc_id") % 7 === 0, md5(concat(col("text"), lit("v2")).cast("binary")))
          .otherwise(col("content_md5")).as("content_md5"))
    (a, b)
  }
}
