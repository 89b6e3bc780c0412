package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 79: form taxonomy audit, date-mention mining, char-entropy gate. */
class Wave79Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  test("Forms.scan: taxonomy precedence, defaults, input counting") {
    // password beats email (a login form asking for an email is LOGIN)
    val login = graft.core.html.Forms.scan(
      """<form action="/login" method="post"><input type="email" name="u">
        |<input type="password" name="p"><input type="hidden" name="c">
        |<input type="submit"></form>""".stripMargin)
    assert(login.map(f => (f.idx, f.action, f.method, f.nInputs, f.kind)) ==
      Vector((0, "/login", "POST", 2, "login")))
    // lone text input named q → search; method defaults to GET
    val search = graft.core.html.Forms.scan(
      """<form action="/s"><input type="text" name="q"></form>""")
    assert(search.head.kind == "search" && search.head.method == "GET")
    // email with other text inputs is NOT a newsletter form
    val mixed = graft.core.html.Forms.scan(
      """<form action="/x"><input type="email" name="e">
        |<input type="text" name="subject"></form>""".stripMargin)
    assert(mixed.head.kind == "other" && mixed.head.nInputs == 2)
    // file input → upload; multiple forms index in document order
    val two = graft.core.html.Forms.scan(
      """<form action="/up"><input type="file" name="d"></form>
        |<form action="/sub"><input type="email" name="e"></form>""".stripMargin)
    assert(two.map(f => (f.idx, f.kind)) ==
      Vector((0, "upload"), (1, "newsletter")))
    assert(graft.core.html.Forms.scan("<p>no forms</p>").isEmpty)
  }

  test("textDates: family counts and ISO-wins normalization") {
    val rows = Seq(
      (1L, "released 2020-06-01 and again March 2, 2021 done"),
      (2L, "see January 15, 1999 for details"),
      (3L, "shipped 3/4/2020 then 12/31/2021"),
      (4L, "no dates here at all"),
      (5L, "bad 2020-13-01 and 2020-00-10 stay unmatched"))
      .toDF("doc_id", "text")
    val out = TextStats.textDates(rows).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getBoolean(5))).toMap
    assert(out(1L) == ((1L, 1L, 0L, "2020-06-01", true))) // ISO beats month-name
    assert(out(2L) == ((0L, 1L, 0L, "1999-01-15", true))) // month map + day pad
    assert(out(3L) == ((0L, 0L, 2L, "2020-03-04", true))) // first slash date wins
    assert(out(4L) == ((0L, 0L, 0L, "", false)))
    assert(out(5L) == ((0L, 0L, 0L, "", false)))          // month/day ranges enforced
  }

  test("charEntropy: quantized milli-bits, flags, degenerate cases") {
    val rows = Seq(
      (1L, "ha ha ha ha ha ha ha ha ha ha ha ha"), // 2 letters, equal → 1 bit
      (2L, "zzzzzzzz zzzzzzzz zzzzzzzz"),          // 1 letter → 0 bits
      (3L, "The quick brown fox jumps over the lazy dog."),
      (4L, ""),
      (5L, "AB ab Ab aB"))                          // case-folded counts
      .toDF("doc_id", "text")
    val out = TextStats.charEntropy(rows).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(4),
        r.getBoolean(5))).toMap
    val (n1, nd1, e1, f1) = out(1L)
    assert(n1 == 24 && nd1 == 2 && e1 >= 998 && e1 <= 1000 && f1)
    val (n2, nd2, e2, f2) = out(2L)
    assert(n2 == 24 && nd2 == 1 && e2 == 0 && f2)
    val (n3, nd3, e3, f3) = out(3L)
    assert(n3 == 35 && nd3 == 26 && e3 > 4000 && !f3) // pangram: near-max entropy
    assert(out(4L) == ((0L, 0L, 0L, false)))
    val (n5, nd5, e5, f5) = out(5L)
    assert(n5 == 8 && nd5 == 2 && e5 >= 998 && e5 <= 1000 && !f5) // < 20 letters
  }
}
