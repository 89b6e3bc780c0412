package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSessionFixture

/** Wave 51: exact-k quota sampling, WARC revisit-record planning. */
class Wave51Spec extends AnyFunSuite {

  lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  test("quota sample: equals the window-sort definition, exactly k per stratum") {
    val docs = (0 until 400).map(i => (s"s${i % 4}", i.toLong)).toDF("stratum", "item")
    val got = Sampling.quotaSample(docs, k = 7).collect()
      .map(r => (r.getString(0), r.getAs[Long]("item"), r.getAs[Long]("rank")))
    assert(got.length == 4 * 7)
    // reference: row_number over (h, item)
    val h = Sampling.md5Mod(concat(lit("strat:"), col("item").cast("string")), Sketches.KmvDomain)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("stratum").orderBy(col("h"), col("item"))
    val ref = docs.withColumn("h", h)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 7)
      .select(col("stratum"), col("item"), col("rank")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSet == ref.toSet)
  }

  test("quota sample: partition-invariant; stratum smaller than k keeps all rows") {
    val docs = ((0 until 40).map(i => ("big", i.toLong)) ++
      Seq(("tiny", 1000L), ("tiny", 1001L))).toDF("stratum", "item")
    val a = Sampling.quotaSample(docs.repartition(1), k = 5).collect()
      .map(_.toSeq).toSet
    val b = Sampling.quotaSample(docs.repartition(11), k = 5).collect()
      .map(_.toSeq).toSet
    assert(a == b)
    val tiny = a.filter(_.head == "tiny")
    assert(tiny.size == 2, "under-quota stratum keeps every row")
  }

  test("quota sample: growth displaces at most the boundary items (stable churn)") {
    val base = (0 until 100).map(i => ("s", i.toLong)).toDF("stratum", "item")
    val grown = (0 until 150).map(i => ("s", i.toLong)).toDF("stratum", "item")
    val keep0 = Sampling.quotaSample(base, k = 10).collect().map(_.getAs[Long]("item")).toSet
    val keep1 = Sampling.quotaSample(grown, k = 10).collect().map(_.getAs[Long]("item")).toSet
    // kept set changes only where a smaller-hash newcomer displaces: the
    // survivors of the old sample stay a prefix-superset intersection
    assert((keep0 intersect keep1).nonEmpty)
    assert((keep1 -- keep0).forall(_ >= 100L), "new entrants come only from the new rows")
  }

  test("warc revisit: planted digests classify and byte-account correctly") {
    val prev = Seq(
      ("https://a.example/p1", "d1"), ("https://a.example/p2", "d2"),
      ("https://b.example/p3", "d3")).toDF("url", "content_md5")
    val cur = Seq(
      ("https://a.example/p1", "d1", 100L),  // unchanged -> revisit
      ("https://a.example/p2", "dX", 200L),  // changed -> response
      ("https://a.example/p9", "d9", 400L),  // new url -> response
      ("https://b.example/p3", "d3", 800L)   // unchanged -> revisit
    ).toDF("url", "content_md5", "n_bytes")
    val rs = SnapshotDiff.warcRevisit(cur, prev).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_records"), r.getAs[Long]("n_revisits"),
        r.getAs[Long]("bytes_saved"), r.getAs[Long]("revisit_permille")))).toMap
    assert(rs("a.example") == ((3L, 1L, 100L, 333L)))
    assert(rs("b.example") == ((1L, 1L, 800L, 1000L)))
  }
}
