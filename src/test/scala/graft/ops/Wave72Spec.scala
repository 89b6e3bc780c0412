package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Http, PdfDates, Punycode}

/** Wave 72: HTTP dates, header parsing, punycode decode. */
class Wave72Spec extends AnyFunSuite {

  test("http-date: three forms, century window, strictness") {
    def ep(s: String) = PdfDates.parseHttpDate(s).map(_.epochSec)
    val t = 784111777L
    assert(ep("Sun, 06 Nov 1994 08:49:37 GMT").contains(t))
    assert(ep("Sunday, 06-Nov-94 08:49:37 GMT").contains(t))
    assert(ep("Sun Nov  6 08:49:37 1994").contains(t))
    assert(ep("Sun Nov 16 08:49:37 1994").isDefined) // two-digit asctime day
    // rfc850 century window: 69 → 2069, 70 → 1970
    assert(ep("Friday, 01-Jan-70 00:00:00 GMT").contains(0L))
    assert(PdfDates.parseHttpDate("Wednesday, 01-Jan-69 00:00:00 GMT")
      .exists(_.epochSec > 3000000000L))
    // not GMT / bad month / out-of-range day all fail
    assert(ep("Sun, 06 Nov 1994 08:49:37 PST").isEmpty)
    assert(ep("Sun, 06 Foo 1994 08:49:37 GMT").isEmpty)
    assert(ep("Thu, 31 Nov 1994 08:49:37 GMT").isEmpty)
  }

  test("header parse: folding-free, first blank line stops, case folds") {
    val raw = ("HTTP/1.1 301 Moved\r\nLocation:  /a \r\nX-Thing: b\r\n" +
      "\r\nX-NotHeader: body").getBytes("ISO-8859-1")
    val hs = Http.headers(raw)
    assert(hs == Vector(("location", "/a"), ("x-thing", "b")))
  }

  test("punycode: round-trip against python-generated encodings") {
    assert(Punycode.decodeLabel("pple-43d").contains("аpple"))
    assert(Punycode.decodeLabel("e1afmkfd").contains("пример"))
    assert(Punycode.decodeLabel("bcher-kva").contains("bücher"))
    assert(Punycode.decodeLabel("eckwd4c7c").contains("ドメイン"))
    // pure-ascii body after delimiter-less input: "abc" has no '-' so all
    // chars are punycode digits — decodes to SOMETHING non-ascii or fails,
    // but never throws
    Punycode.decodeLabel("abc")
    assert(Punycode.decodeLabel("!!!").isEmpty)
    // homograph verdicts
    assert(Punycode.mixedScript("аpple.com"))
    assert(!Punycode.mixedScript("пример.org"))
    assert(!Punycode.mixedScript("bücher.example"))
  }
}
