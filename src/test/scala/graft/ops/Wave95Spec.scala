package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 95: CUPED variance-reduced A/B metrics. */
class Wave95Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  test("cuped: perfectly pre-explained metric adjusts both arms to one mean") {
    import spark.implicits._
    // y = 2x exactly → theta strips ALL variance; hand numbers:
    // n=2, Sx=300, Sy=600, Sxy=100000, Sxx=50000 → theta_pm=2000;
    // adj both users = 600000, mean_adj_m = 300000 in each arm
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val events = Seq(
      (ts(0L), 0L, "purchase", 1.00),
      (ts(100L), 0L, "purchase", 2.00),
      (ts(0L), 1L, "purchase", 2.00),
      (ts(100L), 1L, "purchase", 4.00))
      .toDF("ts", "user_id", "event_type", "value")
    val out = Relational.cuped(events).orderBy("arm").collect()
    assert(out.length == 2)
    val byArm = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getAs[Long]("theta_pm"), r.getAs[Long]("mean_post_m"),
        r.getAs[Long]("mean_adj_m"))).toMap
    assert(byArm(0L) == (1L, 2000L, 200000L, 300000L))
    assert(byArm(1L) == (1L, 2000L, 400000L, 300000L))
  }

  test("cuped: zero pre-variance degrades to theta 0, adjusted = raw mean") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val events = Seq(
      (ts(0L), 0L, "view", 1.00), (ts(100L), 0L, "view", 3.00),
      (ts(0L), 1L, "view", 1.00), (ts(100L), 1L, "view", 5.00))
      .toDF("ts", "user_id", "event_type", "value")
    val out = Relational.cuped(events).orderBy("arm").collect()
    out.foreach { r =>
      assert(r.getAs[Long]("theta_pm") == 0L)
      assert(r.getAs[Long]("mean_adj_m") == r.getAs[Long]("mean_post_m"))
    }
  }
}
