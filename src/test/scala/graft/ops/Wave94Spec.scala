package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 94: full core decomposition (h-index fixpoint), active-learning
  * uncertainty sampling. */
class Wave94Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  test("coreness: triangle + pendant, and a 4-clique with a 2-path") {
    import spark.implicits._
    val n1 = Seq(0L, 1L, 2L, 3L).toDF("id")
    val e1 = Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 0L)).toDF("src", "dst")
    val out1 = Graph.coreness(n1, e1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out1 == Map(0L -> 2L, 1L -> 2L, 2L -> 2L, 3L -> 1L))
    // 4-clique {0..3} (coreness 3) + path 3-4-5 (4, 5 → coreness 1);
    // isolated 6 → 0
    val n2 = (0L to 6L).toDF("id")
    val cl = for (a <- 0 to 3; b <- (a + 1) to 3) yield (a.toLong, b.toLong)
    val e2 = (cl ++ Seq((3L, 4L), (4L, 5L))).toDF("src", "dst")
    val out2 = Graph.coreness(n2, e2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out2 == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L,
      4L -> 1L, 5L -> 1L, 6L -> 0L))
  }

  test("coreness agrees with kCore membership at k=3 on the block graph") {
    import org.apache.spark.sql.functions._
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("id"))
    val n = d.count()
    val edges = Graph.synthSccEdges(d, n)
    val core3 = Graph.kCore(d, edges, k = 3)
      .select(col("id"), col("in_kcore")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val cn = Graph.coreness(d, edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    cn.foreach { case (id, c) =>
      assert((c >= 3) == core3(id),
        s"node $id: coreness $c vs in_3core=${core3(id)}")
    }
  }

  test("uncertainty sample: picks the smallest |margin| rows, ties by id") {
    import spark.implicits._
    // w=(1,0,0,0) → margin = x1; |margins| 5, 10, 10, 50 → pick 5,10(id1),10(id2)
    val feats = Seq(
      (0L, 1L, 50L, 0L, 0L, 0L),
      (1L, -1L, 10L, 0L, 0L, 0L),
      (2L, 1L, 10L, 0L, 0L, 0L),
      (3L, 1L, 5L, 0L, 0L, 0L))
      .toDF("doc_id", "y", "x1", "x2", "x3", "x4")
    val out = Classifier.uncertaintySample(feats, (1L, 0L, 0L, 0L), k = 3)
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(3L, 1L, 2L))
  }
}
