package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Hard-negative mining: the duplicate ceiling excludes planted replicas
  * AND natural near-duplicates; survivors rank by exact cosine. */
class HardNegativesSpec extends AnyFunSuite {

  lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  test("ceiling excludes the cosine-1.0 replica and a 0.99 near-dup") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)),            // anchor (gets a ×1.1 replica planted)
      (1L, Seq(0.9f, 0.1f)),            // cos 0.9939 — above ceiling, excluded
      (2L, Seq(0.5f, 0.5f)),            // cos 0.7071 — hard negative #1
      (3L, Seq(0.0f, 1.0f)))            // cos 0.0    — hard negative #2
      .toDF("vec_id", "embedding")
    val r = Similarity.hardNegatives(emb, nQueries = 1, k = 3, simCeiling = 0.98)
      .orderBy("rank").as[(Long, Long, Long, Double)].collect()
    assert(r.length == 2)               // only two candidates below ceiling
    assert(r(0) == ((0L, 1L, 2L, 0.7071)))
    assert(r(1) == ((0L, 2L, 3L, 0.0)))
    assert(!r.exists(_._3 >= 100000L))  // no replica leaks through
    assert(!r.exists(_._3 == 1L))       // near-dup excluded too
  }

  test("matches bruteForceTopK when the ceiling admits everything") {
    val emb = (0L until 30L).map(i =>
      (i, Seq.tabulate(8)(d => (((i * 37 + d * 17) % 97) - 48).toFloat / 48f)))
      .toDF("vec_id", "embedding")
    val hn = Similarity.hardNegatives(emb, nQueries = 5, k = 3, simCeiling = 2.0)
      .as[(Long, Long, Long, Double)].collect().toSet
    // ceiling 2.0 admits every pair INCLUDING the planted replicas, which
    // are then the rank-1 hits (cosine 1.0) — verify they surface
    assert((0L until 5L).forall(q => hn.contains((q, 1L, q + 100000L, 1.0))))
  }
}
