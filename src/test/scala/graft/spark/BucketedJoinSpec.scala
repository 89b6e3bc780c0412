package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSessionFixture

/** Scale-evidence spec for the bucketing strategy the 100-TB design relies
  * on: two tables bucketed + sorted on the join key join WITHOUT any
  * Exchange (co-located sort-merge), while the same join over plain
  * parquet shuffles both sides. At 10^12 rows that difference is the whole
  * job: repeated joins against a bucketed corpus pay zero shuffle. */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  test("bucketed tables join with no Exchange; unbucketed join shuffles") {
    // managed tables land in the default warehouse; DROP TABLE in the
    // finally block removes their files.
    // newSession(): isolated SQLConf (suites run in parallel on the shared
    // SparkContext — mutating the shared session's conf would race them).
    // AQE rewrites small joins to broadcast, hiding the co-location
    // property under test; pin sort-merge for the plan assertion.
    val spark = this.spark.newSession()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      orders.write.mode("overwrite")
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_b")
      lineitem.write.mode("overwrite")
        .bucketBy(4, "l_orderkey").sortBy("l_orderkey").saveAsTable("lineitem_b")

      val bucketed = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("qty"))
      val bPlan = bucketed.queryExecution.executedPlan.toString
      // the JOIN itself is exchange-free: the only allowed Exchange is the
      // final single-column aggregation
      val joinPart = bPlan.split("HashAggregate").last // below the agg
      assert(!joinPart.contains("Exchange"),
        s"bucketed join must not shuffle, plan:\n$bPlan")

      val plain = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("qty"))
      val pPlan = plain.queryExecution.executedPlan.toString
      assert(pPlan.split("SortMergeJoin").last.contains("Exchange"),
        s"plain join should shuffle under sort-merge, plan:\n$pPlan")

      // same results both ways
      val b = bucketed.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      val p = plain.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      assert(b == p)
    } finally {
      // the conf overrides die with this isolated session; only the
      // (catalog-global) tables need cleanup
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
