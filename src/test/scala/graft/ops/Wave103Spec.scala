package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 103: MAD daily anomalies, bit-length degree histogram. */
class Wave103Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("madAnomaly: hand medians — the spike day flags, normal days do not") {
    import spark.implicits._
    // 'view' daily counts over 5 days: 10, 10, 11, 12, 50.
    // sorted: 10,10,11,12,50 → med (rank 3) = 11; adevs 1,1,0,1,39 →
    // sorted 0,1,1,1,39 → mad = 1. Flag iff adev·1000 > 4448:
    // only the 50-day (39000) flags.
    val counts = Seq(10, 10, 11, 12, 50)
    val events = counts.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(i => (ts(d.toLong * 86400L + i), i.toLong, "view", 1.0))
    }.toDF("ts", "user_id", "event_type", "value")
    val out = Relational.madAnomaly(events).orderBy("day").collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[Long]("cnt"),
        r.getAs[Long]("med"), r.getAs[Long]("mad"),
        r.getAs[Boolean]("anomaly")))
    assert(out.length == 5)
    out.foreach { case (_, _, med, mad, _) =>
      assert(med == 11L && mad == 1L)
    }
    assert(out.map(_._5).toSeq == Seq(false, false, false, false, true))
  }

  test("madAnomaly: zero MAD degrades to any-deviation-flags") {
    import spark.implicits._
    // counts 5,5,5,6: med 5, adevs 0,0,0,1 → mad 0 → only the 6-day flags
    val counts = Seq(5, 5, 5, 6)
    val events = counts.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(i => (ts(d.toLong * 86400L + i), i.toLong, "click", 1.0))
    }.toDF("ts", "user_id", "event_type", "value")
    val out = Relational.madAnomaly(events).orderBy("day").collect()
    assert(out.map(_.getAs[Boolean]("anomaly")).toSeq ==
      Seq(false, false, false, true))
  }

  test("degreeHist: hand graph — bit-length buckets, isolated bucket 0") {
    import spark.implicits._
    // node 9 isolated; node 1 has degree 1 (bucket 1); node 2 degree 3
    // (bucket 2); node 3 degree 4 (bucket 3)
    val nodes = Seq(1L, 2L, 3L, 9L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 2L), (3L, 3L))
      .toDF("src", "dst") // (3,3) self-loop contributes 2 to node 3
    val out = Graph.degreeHist(nodes, edges).orderBy("bucket").collect()
      .map(r => (r.getAs[Int]("bucket"), r.getAs[Long]("n_nodes"),
        r.getAs[Long]("min_deg"), r.getAs[Long]("max_deg")))
    // degrees: 1→1, 2→3, 3→4, 9→0
    assert(out.toSeq == Seq((0, 1L, 0L, 0L), (1, 1L, 1L, 1L),
      (2, 1L, 3L, 3L), (3, 1L, 4L, 4L)))
  }
}
