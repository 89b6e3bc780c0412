package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 128: nearest-centroid confusion and greedy k-center seeds. */
class Wave128Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  private def emb(rows: (Long, Seq[Float], Int)*) = {
    import spark.implicits._
    rows.map { case (id, v, l) => (id, v.toArray, l) }
      .toDF("vec_id", "embedding", "label")
  }

  test("centroidConfusion: separable clusters give a diagonal matrix") {
    val e = emb(
      (0L, Seq(1f, 0f), 0), (1L, Seq(0.9f, 0.1f), 0),
      (2L, Seq(0f, 1f), 1), (3L, Seq(0.1f, 0.9f), 1))
    val out = Similarity.centroidConfusion(e).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(out == Map((0L, 0L) -> ((2L, 1000L)), (1L, 1L) -> ((2L, 1000L))))
  }

  test("centroidConfusion: a vector on the wrong side shows off-diagonal") {
    val e = emb(
      (0L, Seq(1f, 0f), 0), (1L, Seq(0.9f, 0f), 0),
      (2L, Seq(0.95f, 0f), 1),   // labeled 1 but sits in cluster 0
      (3L, Seq(0f, 1f), 1), (4L, Seq(0f, 0.9f), 1))
    val rows = Similarity.centroidConfusion(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // centroid(0) = (950, 0); centroid(1) = floor((950,1900)/3) = (316,633)
    // vec 2 at (950,0): d2 to c0 = 0; to c1 = 634²+633² — cluster 0 wins
    assert(rows.contains((1L, 0L, 1L)))
    assert(rows.contains((0L, 0L, 2L)))
  }

  test("kcenterSeeds: hand geometry — corners picked before the middle") {
    // 1-D line at milli coords 0, 1, 10, 21 (floats 0.000/0.001/0.010/0.021)
    val e = emb(
      (0L, Seq(0f), 9), (1L, Seq(0.001f), 9),
      (2L, Seq(0.01f), 9), (3L, Seq(0.021f), 9))
    val out = Similarity.kcenterSeeds(e, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // seed1 = vec 0 (min id); farthest = vec 3 (21² = 441);
    // then vec 2: min(d² to 0 = 100, d² to 3 = 121) = 100 — largest
    assert(out(0) == ((1L, 0L, 0L)))
    assert(out(1) == ((2L, 3L, 441L)))
    assert(out(2) == ((3L, 2L, 100L)))
  }

  test("kcenterSeeds: radius is non-increasing and seeds are distinct") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Similarity.kcenterSeeds(e, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._2).distinct.length == 5)
    val radii = out.drop(1).map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b })
  }
}
