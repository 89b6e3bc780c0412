package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 102: duplication × quality matrix, LSH band planning. */
class Wave102Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  test("dupQualityMatrix: md5 buckets cross the gate decision exactly") {
    import spark.implicits._
    // a gate-passing doc (60 diverse tokens, 2 stopwords, clean ratios)
    val good = "the and " + (1 to 58).map(i => s"word$i").mkString(" ")
    val corpus = Seq(
      (10L, good), (11L, good),           // dup_2_3, keep
      (1L, "x"), (2L, "x"), (3L, "x"),    // dup_2_3, gopher-fail
      (4L, "y"))                          // unique, gopher-fail
      .toDF("doc_id", "text")
    val out = TextStats.dupQualityMatrix(corpus).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_keep"), r.getAs[Long]("keep_pm"))).toMap
    assert(out == Map(
      "dup_2_3" -> (5L, 2L, 400L),
      "unique" -> (1L, 0L, 0L)))
  }

  test("lshTune: fixed-point S-curve areas match a direct Scala replay; argmin is unique") {
    val out = Dedup.lshTune(spark).orderBy("bands").collect()
    assert(out.length == 4)
    def powPm(base: Long, n: Int): Long =
      (2 to n).foldLeft(base)((acc, _) => acc * base / 1000L)
    out.foreach { r =>
      val (b, rr) = (r.getAs[Int]("bands"), r.getAs[Int]("rows_per_band"))
      var fp = 0L; var fn = 0L
      for (i <- 0 until 100) {
        val s = 5L + 10L * i
        val pAnd = powPm(s, rr)
        val pCatch = 1000L - powPm(1000L - pAnd, b)
        if (s <= 700L) fp += pCatch else fn += 1000L - pCatch
      }
      assert(r.getAs[Long]("fp_area") == fp, s"fp b=$b r=$rr")
      assert(r.getAs[Long]("fn_area") == fn, s"fn b=$b r=$rr")
      assert(r.getAs[Long]("cost") == fp + fn)
    }
    assert(out.count(_.getAs[Boolean]("chosen")) == 1)
    val chosenCost = out.filter(_.getAs[Boolean]("chosen"))
      .head.getAs[Long]("cost")
    assert(chosenCost == out.map(_.getAs[Long]("cost")).min)
  }

  test("lshTune: more rows per band shifts the S-curve right (fewer false positives)") {
    val out = Dedup.lshTune(spark).collect()
      .map(r => r.getAs[Int]("rows_per_band") -> r.getAs[Long]("fp_area")).toMap
    assert(out(2) > out(4) && out(4) > out(8) && out(8) > out(16))
  }
}
