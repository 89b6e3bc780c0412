package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture
import org.apache.spark.sql.functions._

/** Wave 116: Kaplan–Meier survival table and SCD2 interval history. */
class Wave116Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  private def ev(rows: Seq[(Long, String, Long, Double)]) = {
    import spark.implicits._
    rows.toDF("user_id", "ts_s", "event_id", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
      .drop("ts_s")
  }

  test("survival: hand risk sets and floored permille curve") {
    // horizon = 01-20 (u4); u1 churn dur 4, u2 churn dur 0,
    // u3 censored dur 9 (horizon-last=1), u4 censored dur 2
    val events = ev(Seq(
      (1L, "2024-01-01 10:00:00", 1L, 0.0), (1L, "2024-01-05 10:00:00", 2L, 0.0),
      (2L, "2024-01-01 11:00:00", 3L, 0.0),
      (3L, "2024-01-10 09:00:00", 4L, 0.0), (3L, "2024-01-19 09:00:00", 5L, 0.0),
      (4L, "2024-01-18 09:00:00", 6L, 0.0), (4L, "2024-01-20 09:00:00", 7L, 0.0)))
    val out = Relational.survival(events).orderBy("t_day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // S: 1000·3div4=750 → d=0 keeps 750 → 750·1div2=375 → 375
    assert(out.toSeq == Seq(
      (0L, 1L, 0L, 4L, 750L),
      (2L, 0L, 1L, 3L, 750L),
      (4L, 1L, 0L, 2L, 375L),
      (9L, 0L, 1L, 1L, 375L)))
  }

  test("survival: every user censored → flat 1000 curve") {
    val events = ev(Seq(
      (1L, "2024-01-01 10:00:00", 1L, 0.0), (1L, "2024-01-03 10:00:00", 2L, 0.0),
      (2L, "2024-01-02 10:00:00", 3L, 0.0), (2L, "2024-01-03 11:00:00", 4L, 0.0)))
    val out = Relational.survival(events).orderBy("t_day").collect()
    assert(out.forall(_.getLong(4) == 1000L))
    assert(out.map(_.getLong(1)).sum == 0L) // no churn events
  }

  test("scd2: runs collapse, versions number changes, lead closes intervals") {
    val events = ev(Seq(
      (1L, "2024-01-01 00:00:01", 1L, 5.0),   // low
      (1L, "2024-01-01 00:00:02", 2L, 6.0),   // low (same run)
      (1L, "2024-01-01 00:00:03", 3L, 50.0),  // mid
      (1L, "2024-01-01 00:00:04", 4L, 5.0)))  // low again (new version)
    val out = Relational.scd2(events).orderBy("version").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(4) == -1L,
        r.getBoolean(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      (1L, "low", false, false, 2L),
      (2L, "mid", false, false, 1L),
      (3L, "low", true, true, 1L)))
    // interval chaining: each valid_to equals the next valid_from
    val iv = Relational.scd2(events).orderBy("version").collect()
      .map(r => (r.getLong(3), r.getLong(4)))
    assert(iv(0)._2 == iv(1)._1 && iv(1)._2 == iv(2)._1)
  }

  test("scd2: timestamp ties break by event_id deterministically") {
    val events = ev(Seq(
      (2L, "2024-01-01 00:00:01", 1L, 5.0),     // low first
      (2L, "2024-01-01 00:00:01", 2L, 500.0)))  // high second (same ts)
    val out = Relational.scd2(events).orderBy("version").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getBoolean(5)))
    assert(out.toSeq == Seq((1L, "low", false), (2L, "high", true)))
  }
}
