package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 107: global clustering summary. */
class Wave107Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  test("globalClustering: triangle + pendant — hand transitivity and local average") {
    import spark.implicits._
    // triangle 1-2-3 plus pendant 4 on node 3, isolated 9.
    // degrees: 1→2, 2→2, 3→3, 4→1, 9→0; wedges = 1+1+3+0+0 = 5;
    // T = 1 (Σ per-node = 3); transitivity = 3000/5 = 600.
    // locals: 1→1000, 2→1000, 3→ 1·2·1000 div 6 = 333, 4→0, 9→0 →
    // avg = 2333 div 5 = 466
    val nodes = Seq(1L, 2L, 3L, 4L, 9L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
      .toDF("src", "dst")
    val r = Graph.globalClustering(nodes, edges).collect()(0)
    assert(r.getAs[Long]("n_nodes") == 5L)
    assert(r.getAs[Long]("n_wedges") == 5L)
    assert(r.getAs[Long]("n_triangles") == 1L)
    assert(r.getAs[Long]("transitivity_pm") == 600L)
    assert(r.getAs[Long]("avg_local_x1000") == 466L)
  }

  test("globalClustering: triangle-free graph scores zero transitivity") {
    import spark.implicits._
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val r = Graph.globalClustering(nodes, edges).collect()(0)
    assert(r.getAs[Long]("n_triangles") == 0L)
    assert(r.getAs[Long]("transitivity_pm") == 0L)
    assert(r.getAs[Long]("n_wedges") == 2L)
  }
}
