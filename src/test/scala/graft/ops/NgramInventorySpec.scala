package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Gram-side repeated-n-gram inventory: distinct-doc counts, exemplar ids,
  * in-row expansion semantics. */
class NgramInventorySpec extends AnyFunSuite {

  lazy val spark = SparkSessionFixture.spark

  test("cross-doc grams counted once per doc; within-doc repeats collapse") {
    import spark.implicits._
    val docs = Seq(
      (7L, "a b c d e x a b c d e"), // "a b c d e" twice WITHIN doc 7
      (3L, "z a b c d e y"),
      (9L, "a b c d e"),
      (1L, "too short here")).toDF("doc_id", "text")
    val out = TextStats.repeatedNgrams(docs, n = 5, minDocs = 2)
      .orderBy("gram").as[(String, Long, Long)].collect()
    // only "a b c d e" spans all three docs; doc 7's double counts once
    assert(out.contains(("a b c d e", 3L, 3L)))
    assert(out.forall(_._2 >= 2))
    // no gram claims more docs than exist
    assert(out.forall(_._2 <= 3))
  }

  test("docs shorter than n contribute nothing; min doc_id is the exemplar") {
    import spark.implicits._
    val docs = Seq(
      (10L, "p q r"), (20L, "m m m m m"), (30L, "m m m m m m")).toDF("doc_id", "text")
    val out = TextStats.repeatedNgrams(docs, n = 5, minDocs = 2)
      .as[(String, Long, Long)].collect()
    assert(out.toVector == Vector(("m m m m m", 2L, 20L)))
  }
}
