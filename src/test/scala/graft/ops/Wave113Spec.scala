package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 113: boundary-window fragment stitching + snapshot drift monitor. */
class Wave113Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  test("continuationPairs: trailing == leading 8-gram links docs; short docs contribute nothing") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c d e f g h t1 t2 t3 t4 t5 t6 t7 t8"),
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 more words follow here"),
      (2L, "too short"))
      .toDF("doc_id", "text")
    val out = TextStats.continuationPairs(docs).collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 0L && out(0).getLong(1) == 1L)
    assert(out(0).getString(2) == Dedup.md5Hex("t1 t2 t3 t4 t5 t6 t7 t8"))
  }

  test("continuationPairs: exact-duplicate 8-token docs pair both ways (head == tail); salt-cap drops hot boundaries") {
    import spark.implicits._
    val dup = "x1 x2 x3 x4 x5 x6 x7 x8"
    val docs = Seq((3L, dup), (4L, dup)).toDF("doc_id", "text")
    val both = TextStats.continuationPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(both == Set((3L, 4L), (4L, 3L)))
    // 3 copies → bucket of 6 edge rows; cap 4 drops the whole bucket
    val hot = Seq((5L, dup), (6L, dup), (7L, dup)).toDF("doc_id", "text")
    assert(TextStats.continuationPairs(hot, maxBucket = 4).collect().isEmpty)
  }

  test("corpusWithContinuations plants recoverable pairs at id+940000") {
    import spark.implicits._
    val docs = Seq(
      (0L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (5L, "other text entirely unrelated body with many words"))
      .toDF("doc_id", "text")
    val pairs = TextStats.continuationPairs(TextStats.corpusWithContinuations(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 940000L)))
    assert(!pairs.exists(_._1 == 5L)) // 5 % 13 != 0 → no partner
  }

  test("snapshotDrift: floored shares, signed deltas, integer TVD") {
    import spark.implicits._
    def words(k: Int) = Seq.fill(k)("w").mkString(" ")
    val docs = Seq(
      (0L, words(10)),   // a_lt50, snap A
      (1L, words(60)),   // b_50_99, snap B
      (2L, words(10)),   // a_lt50, snap A
      (3L, words(250)))  // d_200_499, snap B
      .toDF("doc_id", "text")
    val out = TextStats.snapshotDrift(docs).orderBy("bucket").collect()
    val rows = out.map(r => (r.getString(0), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
      r.getAs[Long]("share_a_pm"), r.getAs[Long]("share_b_pm"), r.getAs[Long]("delta_pm")))
    assert(rows.toSeq == Seq(
      ("a_lt50", 2L, 0L, 1000L, 0L, 1000L),
      ("b_50_99", 0L, 1L, 0L, 500L, -500L),
      ("d_200_499", 0L, 1L, 0L, 500L, -500L)))
    assert(out.forall(_.getAs[Long]("tvd_pm") == 1000L))
  }
}
