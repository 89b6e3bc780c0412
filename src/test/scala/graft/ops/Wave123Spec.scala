package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 123: exact KS two-sample test and exact per-source quantiles. */
class Wave123Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  private def docs(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  test("ksTest: identical samples → D = 0, no rejection") {
    val d = docs(
      (0L, "a b c", "src0"), (1L, "a b c d", "src0"),
      (2L, "x y z", "src1"), (3L, "x y z w", "src1"))
    val r = StatTests.ksTest(d, "src0", "src1").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 2L, 0L, 0L)))
    assert(!r.getBoolean(4))
  }

  test("ksTest: disjoint supports → D = 1 (d_num = n·m)") {
    val d = docs(
      (0L, "a", "src0"), (1L, "b", "src0"),                // 1 token each
      (2L, "w x y z q", "src1"), (3L, "w x y z q r", "src1")) // 5,6 tokens
    val r = StatTests.ksTest(d, "src0", "src1").collect().head
    assert(r.getLong(2) == 4L)       // n·m = 2·2
    assert(r.getLong(3) == 1000L)    // D = 1
    // tiny n: D=1 but 4²·1e6 = 1.6e7 < 1844164·2·2·4 ≈ 2.95e7 → NOT
    // significant at n=m=2 (exact small-sample honesty)
    assert(!r.getBoolean(4))
  }

  test("ksTest: hand ECDF gap with overlapping supports") {
    // A tokens: 1,2,3 ; B tokens: 2,3,3
    val d = docs(
      (0L, "a", "src0"), (1L, "a b", "src0"), (2L, "a b c", "src0"),
      (3L, "x y", "src1"), (4L, "x y z", "src1"), (5L, "p q r", "src1"))
    val r = StatTests.ksTest(d, "src0", "src1").collect().head
    // grid v=1: cumA=1 cumB=0 → |1·3−0·3|=3; v=2: cumA=2 cumB=1 → 3;
    // v=3: 3,3 → 0 ⇒ d_num=3, D=3/9=333pm
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((3L, 3L, 3L, 333L)))
  }

  test("ksTest: large shifted samples reject at 0.05") {
    import spark.implicits._
    val a = (0L until 200L).map(i => (i, Seq.fill(5)("w").mkString(" "), "src0"))
    val b = (200L until 400L).map(i => (i, Seq.fill(9)("w").mkString(" "), "src1"))
    val r = StatTests.ksTest((a ++ b).toDF("doc_id", "text", "source"),
      "src0", "src1").collect().head
    assert(r.getLong(3) == 1000L && r.getBoolean(4))
  }

  test("sourceLengthQuantiles: hand ranks at ceil(q·n)") {
    // src0: values 1..10 → p25 = v[3] = 3, p50 = v[5] = 5,
    // p75 = v[8] = 8, p95 = v[10] = 10
    val rows = (1 to 10).map(i =>
      (i.toLong, Seq.fill(i)("t").mkString(" "), "src0"))
    val r = StatTests.sourceLengthQuantiles(docs(rows: _*)).collect().head
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == (("src0", 10L, 3L, 5L, 8L, 10L)))
  }

  test("sourceLengthQuantiles: singleton source puts every quantile at its value") {
    val r = StatTests.sourceLengthQuantiles(docs((0L, "a b c", "solo")))
      .collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(5)) == ((1L, 3L, 3L)))
  }
}
