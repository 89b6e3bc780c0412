package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 97: one-hop label smoothing, experiment power analysis. */
class Wave97Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  test("labelSmooth: hand graph — in-neighbor means, isolated fallback") {
    import spark.implicits._
    val nodes = Seq((0L, 10L), (1L, 20L), (2L, 30L)).toDF("id", "score")
    val edges = Seq((0L, 1L), (2L, 1L), (1L, 2L)).toDF("src", "dst")
    val out = Graph.labelSmooth(nodes, edges).orderBy("id").collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("indeg"),
        r.getAs[Long]("nbr_mean_m"), r.getAs[Long]("smoothed_m"))).toMap
    // node 0: isolated → nbr_mean = own → smoothed = own
    assert(out(0L) == (0L, 10000L, 10000L))
    // node 1: neighbors 10+30 → mean 20000m; (700·20000m' + 300·20000)/1000
    assert(out(1L) == (2L, 20000L, 20000L))
    // node 2: neighbor 20 → (700·30·1000 + 300·20000) div 1000 = 27000
    assert(out(2L) == (1L, 20000L, 27000L))
  }

  test("labelSmooth: alpha 1000 returns own score, alpha 0 returns the mean") {
    import spark.implicits._
    val nodes = Seq((0L, 10L), (1L, 20L)).toDF("id", "score")
    val edges = Seq((0L, 1L)).toDF("src", "dst")
    val own = Graph.labelSmooth(nodes, edges, alphaPm = 1000L)
      .orderBy("id").collect()
    assert(own.map(_.getAs[Long]("smoothed_m")).toSeq == Seq(10000L, 20000L))
    val mean = Graph.labelSmooth(nodes, edges, alphaPm = 0L)
      .orderBy("id").collect()
    assert(mean.map(_.getAs[Long]("smoothed_m")).toSeq == Seq(10000L, 10000L))
  }

  test("powerAnalysis: hand variance — sigma $50 needs 1570 users/arm at $5 MDE") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // two users: $10 and $110 → var = 2.5e7 cents² (σ = $50);
    // n_req_mde5 = ceil(2·7848880·2.5e7 / 2.5e11) = 1570; mde10 → 393
    val events = Seq(
      (ts(0L), 0L, "purchase", 10.00), (ts(1L), 1L, "purchase", 110.00))
      .toDF("ts", "user_id", "event_type", "value")
    val r = Relational.powerAnalysis(events).collect()(0)
    assert(r.getAs[Long]("n_users") == 2L)
    assert(r.getAs[Long]("mean_c") == 6000L)
    assert(r.getAs[Long]("var_c2") == 25000000L)
    assert(r.getAs[Long]("n_req_mde5") == 1570L)
    assert(r.getAs[Long]("n_req_mde10") == 393L)
  }

  test("powerAnalysis: zero variance needs no samples; repeat events pool per user") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // both users total $20 (one via two $10 events) → var 0 → n_req 0
    val events = Seq(
      (ts(0L), 0L, "view", 10.00), (ts(1L), 0L, "view", 10.00),
      (ts(0L), 1L, "view", 20.00))
      .toDF("ts", "user_id", "event_type", "value")
    val r = Relational.powerAnalysis(events).collect()(0)
    assert(r.getAs[Long]("var_c2") == 0L)
    assert(r.getAs[Long]("n_req_mde5") == 0L)
  }
}
