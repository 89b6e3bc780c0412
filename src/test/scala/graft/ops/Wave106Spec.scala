package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 106: vocabulary-coverage curve. */
class Wave106Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  test("vocabCoverage: hand ranks — count-desc word-asc order, exact OOV mass") {
    import spark.implicits._
    // counts: b=4, a=3, c=2, d=1 → ranks b1 a2 c3 d4.
    // size 2: covered 7, oov 3 → 300pm; size 3: covered 9, oov 1 → 100pm
    val docs = Seq("b b a c", "b a d", "b a c").toDF("text")
    val out = Tokenizer.vocabCoverage(docs, sizes = Seq(2, 3))
      .orderBy("vocab_size").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == Seq(
      (2L, 2L, 7L, 3L, 300L),
      (3L, 3L, 9L, 1L, 100L)))
  }

  test("vocabCoverage: ties rank by word asc; size beyond vocab covers everything") {
    import spark.implicits._
    // x and y both count 2 → x rank 1, y rank 2 (word asc)
    val docs = Seq("y x", "x y").toDF("text")
    val out = Tokenizer.vocabCoverage(docs, sizes = Seq(1, 10))
      .orderBy("vocab_size").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 1L, 2L, 2L), (10L, 2L, 4L, 0L)))
  }
}
