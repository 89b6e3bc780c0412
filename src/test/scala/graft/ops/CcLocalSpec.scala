package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSessionFixture

/** The driver-local union-find short-circuit in Dedup.connectedComponents
  * must be LOSSLESS: cap=0 (forcing the distributed alternating-star
  * loop) and the default cap must produce identical (doc_id, cluster_id)
  * labelings — same discipline as Graph's LocalGraphCap equality test. */
class CcLocalSpec extends AnyFunSuite {

  lazy val spark = SparkSessionFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("local union-find equals the distributed star loop on real pair sets") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = Dedup.corpusWithReplicas(docs)
    for (pairs <- Seq(
        Dedup.minhashLsh(corpus, threshold = 0.7).select(col("a"), col("b")),
        Dedup.simhashPairs(corpus).select(col("a"), col("b")))) {
      val local = canon(Dedup.connectedComponents(pairs))
      val dist = canon(Dedup.connectedComponents(pairs, localCap = 0))
      assert(local == dist, "local vs distributed CC labeling differs")
      assert(local.nonEmpty)
    }
  }

  test("self-loops and duplicate edges are canonicalized identically on both paths") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 1L), (3L, 3L), (2L, 5L), (7L, 8L), (8L, 9L),
      (10L, 11L), (11L, 10L)).toDF("a", "b")
    val local = canon(Dedup.connectedComponents(pairs))
    val dist = canon(Dedup.connectedComponents(pairs, localCap = 0))
    assert(local == dist)
    assert(local.contains((5L, 1L)) && local.contains((9L, 7L)))
  }
}
