package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 108: language-ID confusion matrix. */
class Wave108Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  test("langidEval: hand matrix — hits, a miss, and markerless text to 'und'") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "the cat and the dog of note"),   // en detected
      (2L, "en", "der hund und die katze here"),   // mislabeled/mixed → de
      (3L, "zh", "words without any markers"),     // zh has no markers → und
      (4L, "fr", "le chat et les gens de paris"))  // fr markers + 'de'(es) tie?
      .toDF("doc_id", "lang", "text")
    val out = TextStats.langidEval(docs).orderBy("lang", "detected").collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n"),
        r.getAs[Long]("lang_n"), r.getAs[Long]("share_pm")))
    // doc 4: fr markers le/les/et = 3 hits, es marker de = 1 → fr wins
    assert(out.toSeq == Seq(
      ("en", "de", 1L, 2L, 500L),
      ("en", "en", 1L, 2L, 500L),
      ("fr", "fr", 1L, 1L, 1000L),
      ("zh", "und", 1L, 1L, 1000L)))
  }
}
