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

  test("random walks: deterministic, edge-respecting, dangling stops, cap selects smallest") {
    val nodes = (0L to 5L).toDF("id")
    // 0->{1,2,3}, 1->{2}, 2->{0}, 3 dangling, 4->{5}, 5->{4}
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (2L, 0L),
      (4L, 5L), (5L, 4L)).toDF("src", "dst")
    val w = Graph.randomWalks(nodes, edges, len = 3)
    val a = w.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Graph.randomWalks(nodes.repartition(7), edges.repartition(5), len = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b, "bit-identical on any partitioning")
    val edgeSet = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every consecutive step follows a real edge
    val byWalk = a.groupBy(_._1).values
    byWalk.foreach { steps =>
      val path = steps.toVector.sortBy(_._2).map(_._3)
      path.zip(path.drop(1)).foreach(p => assert(edgeSet.contains(p), s"bad hop $p"))
    }
    // walker starting at dangling node 3 emits only step 0
    assert(a.count(_._1 == 3L) == 1)
    // walkers in the 4<->5 cycle always run the full 3 steps
    assert(a.count(_._1 == 4L) == 4)
    // maxDeg=1 restricts node 0 to its smallest neighbor (1)
    val capped = Graph.randomWalks(nodes, edges, len = 1, maxDeg = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(capped.find(x => x._1 == 0L && x._2 == 1L).get._3 == 1L)
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
