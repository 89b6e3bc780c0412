package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 81: bow-tie decomposition, all-but-the-top anisotropy audit. */
class Wave81Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  test("bowtie: fixture graph classifies into all seven regions") {
    val nodes = spark.range(100).toDF("id")
    val out = Graph.bowtie(nodes, Graph.bowtieEdges(nodes)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 100)
    // region spot checks straight from the construction
    assert((0L to 29L).forall(out(_) == "core"))
    assert((30L to 44L).forall(out(_) == "in"))
    assert((50L to 69L).forall(out(_) == "out"))
    assert((70L to 74L).forall(out(_) == "tendril_in"))
    assert((75L to 79L).forall(out(_) == "tendril_out"))
    assert((80L to 84L).forall(out(_) == "tube"))
    assert((85L to 99L).forall(out(_) == "disc"))   // separate 15-cycle
    assert((45L to 49L).forall(out(_) == "disc"))   // isolated singletons
  }

  test("topDirectionComponent: energy shares are exact and bounded") {
    // corpus dominated by one direction: e0-heavy vectors plus one
    // orthogonal outlier
    val rows = (0L until 8L).map { i =>
      val v = Array.fill(4)(0.0f)
      v(0) = 0.4f + 0.01f * i; v(1) = 0.02f * i
      (i, v.toSeq)
    } :+ (8L, Seq(0.0f, 0.0f, 0.5f, 0.0f))
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity.topDirectionComponent(df, rounds = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getBoolean(4))).toMap
    // e0-dominant vectors put nearly all energy on the top direction
    assert(out(0L)._1 > 900 && out(0L)._2)
    // the orthogonal outlier puts almost none
    assert(out(8L)._1 < 100 && !out(8L)._2)
    // ratio is cos²·1000: never above 1000
    assert(out.values.forall(_._1 <= 1000))
  }
}
