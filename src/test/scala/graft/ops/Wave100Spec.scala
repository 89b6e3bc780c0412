package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 100: RAKE keyword extraction. */
class Wave100Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  test("rakeKeywords: hand RAKE — degree/freq scores, longest phrase wins") {
    import spark.implicits._
    // "fast scan the fast scan table a table": phrases = [fast scan],
    // [fast scan table], [table]. freq: fast 2, scan 2, table 3.
    // degree: fast 2+3=5, scan 5, table 3+3+1=7? no: phrases containing
    // table: [fast scan table] (len 3) and [table] (len 1) and the second
    // [table]: runs are "fast scan", "fast scan table", "table" →
    // table freq 2, degree 3+1=4. fast: 5·1000/2=2500, scan 2500,
    // table 4·1000/2=2000. scores: "fast scan"=5000,
    // "fast scan table"=7000, "table"=2000
    val docs = Seq((1L, "fast scan the fast scan table a table"))
      .toDF("doc_id", "text")
    val out = TextStats.rakeKeywords(docs).orderBy("rank").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getInt(3)))
    assert(out.toSeq == Seq(
      ("fast scan table", 7000L, 1),
      ("fast scan", 5000L, 2),
      ("table", 2000L, 3)))
  }

  test("rakeKeywords: duplicate phrases dedupe but their occurrences still count") {
    import spark.implicits._
    // "x a x a y": phrases [x], [x], [y] → x freq 2 degree 2 → score 1000;
    // dedup leaves one "x" row; y score 1000; tie → phrase asc
    val docs = Seq((1L, "x a x a y")).toDF("doc_id", "text")
    val out = TextStats.rakeKeywords(docs).orderBy("rank").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getInt(3)))
    assert(out.toSeq == Seq(("x", 1000L, 1), ("y", 1000L, 2)))
  }

  test("rakeKeywords: all-stopword and empty docs emit no rows; k bounds output") {
    import spark.implicits._
    val docs = Seq((1L, "a the a"), (2L, ""),
      (3L, "p q the r s the t u the v w the x y"))
      .toDF("doc_id", "text")
    val out = TextStats.rakeKeywords(docs).collect()
    assert(!out.exists(r => r.getLong(0) == 1L || r.getLong(0) == 2L))
    assert(out.count(_.getLong(0) == 3L) == 3)
  }
}
