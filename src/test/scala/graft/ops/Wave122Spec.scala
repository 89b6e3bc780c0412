package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture
import org.apache.spark.sql.functions._

/** Wave 122: bucketed range join and self-join skew estimator. */
class Wave122Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  private def nation(rows: (Int, String)*) = {
    import spark.implicits._
    rows.map { case (k, n) => (k, n, 0) }
      .toDF("n_nationkey", "n_name", "n_regionkey")
  }

  private def events(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toDF("event_id", "user_id")
  }

  test("rangeBucketJoin: points land in the covering range exactly") {
    // nation 0 covers [0,3999], nation 1 [4000,7999]
    val n = nation((0, "ALPHA"), (1, "BETA"))
    // ips: user 1,event 1 → 997+13=1010 (ALPHA); user 4,event 2 →
    // 3988+26=4014 (BETA); user 0,event 0 → 0 (ALPHA, lower edge);
    // user 4, event 1 → 3988+13=4001 (BETA, crosses bucket 3→4 edge)
    val e = events((1L, 1L), (2L, 4L), (0L, 0L), (1L, 4L))
    val out = Relational.rangeBucketJoin(e, n).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out("ALPHA") == ((2L, 0L, 1010L)))
    assert(out("BETA") == ((2L, 4001L, 4014L)))
  }

  test("rangeBucketJoin: range spanning multiple buckets matches all of them") {
    val n = nation((0, "WIDE"))           // [0,3999] spans buckets 0..3
    val e = events((0L, 0L), (77L, 1L), (231L, 1L), (0L, 3L))
    // ips: 0, 997+1001=1998, 997+3003=4000?? recompute: user*997+event*13
    // (0,0)→0 b0; (1,77)→997+1001=1998 b1; (1,231)→997+3003=4000 → OUT
    // of WIDE (hi 3999) — must be dropped despite landing in bucket 4;
    // (3,0)→2991 b2
    val out = Relational.rangeBucketJoin(e, n).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "WIDE" && r.getLong(1) == 3L &&
      r.getLong(2) == 0L && r.getLong(3) == 2991L)
  }

  test("rangeBucketJoin: full tiling on real tables — every event matched once") {
    val e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val n = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    val out = Relational.rangeBucketJoin(e, n)
    assert(out.agg(sum("n_events")).collect().head.getLong(0) == e.count())
    // the plan must not contain a nested-loop / cartesian product
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") &&
      !plan.contains("CartesianProduct"), plan.take(400))
  }

  test("joinSkewEstimate: hand counts — F2, uniform estimate, hot key") {
    import spark.implicits._
    // keys: 1×4, 2×2, 3×1, 4×1 → n=8 d=4 F2=16+4+1+1=22
    val df = (Seq.fill(4)(1L) ++ Seq.fill(2)(2L) ++ Seq(3L, 4L))
      .zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("event_id", "user_id")
    val r = Relational.joinSkewEstimate(df, "user_id").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((8L, 4L, 22L)))
    assert(r.getLong(3) == 16L)            // 64 div 4
    assert(r.getLong(4) == 1375L)          // 22·4·1000 div 64
    assert(r.getLong(5) == 1L && r.getLong(6) == 4L)
    assert(r.getLong(7) == 727L)           // 16·1000 div 22
  }

  test("joinSkewEstimate: uniform keys sit at exactly 1000 pm") {
    import spark.implicits._
    val df = (0L until 12L).map(i => (i, i % 4)).toDF("event_id", "user_id")
    val r = Relational.joinSkewEstimate(df, "user_id").collect().head
    assert(r.getLong(4) == 1000L)
    // tie on c=3 → hot key is the max key (deterministic)
    assert(r.getLong(5) == 3L)
  }
}
