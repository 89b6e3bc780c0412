package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Wave 84: charset mismatch audit, iframe audit. */
class Wave84Spec extends AnyFunSuite {

  test("isValidUtf8: strict validation incl. overlong/surrogate rejection") {
    import graft.core.html.CharsetAudit.isValidUtf8
    assert(isValidUtf8("plain ascii".getBytes("UTF-8")))
    assert(isValidUtf8("café 中文 😀".getBytes("UTF-8")))
    // bare latin-1 high byte
    assert(!isValidUtf8(Array('a'.toByte, 0xE9.toByte, 'b'.toByte)))
    // overlong encoding of '/' (C0 AF)
    assert(!isValidUtf8(Array(0xC0.toByte, 0xAF.toByte)))
    // UTF-8-encoded surrogate (ED A0 80)
    assert(!isValidUtf8(Array(0xED.toByte, 0xA0.toByte, 0x80.toByte)))
    // truncated 3-byte sequence
    assert(!isValidUtf8(Array(0xE4.toByte, 0xB8.toByte)))
    // out-of-range F5 lead
    assert(!isValidUtf8(Array(0xF5.toByte, 0x80.toByte, 0x80.toByte, 0x80.toByte)))
  }

  test("CharsetAudit.scan: routing and mismatch flags") {
    import graft.core.html.CharsetAudit
    val dd = CharsetAudit.scan(
      "<meta charset='iso-8859-1'>résumé".getBytes("UTF-8"))
    assert(dd.declared == "iso-8859-1" && dd.validUtf8 && dd.mismatch &&
      dd.route == "declared")
    // declared latin-1 over REAL latin-1 bytes is consistent
    val ok = CharsetAudit.scan(
      "<meta charset='iso-8859-1'>café".getBytes("ISO-8859-1"))
    assert(!ok.validUtf8 && !ok.mismatch)
    // unknown declared charset falls through to UTF-8 routing
    val unk = CharsetAudit.scan("<meta charset='klingon-8'>abc".getBytes("UTF-8"))
    assert(unk.route == "utf-8" && !unk.mismatch)
    // BOM detection
    assert(CharsetAudit.scan(Array(0xFF.toByte, 0xFE.toByte, 'a'.toByte, 0.toByte))
      .bom == "utf-16le")
  }

  test("Iframes.scan: host parsing, third-party, sandbox, ad markers") {
    import graft.core.html.Iframes
    assert(Iframes.host("https://a.example:8080/x?q") == "a.example")
    assert(Iframes.host("/relative/path") == "")
    val fs = Iframes.scan(
      """<iframe src="https://cdn.example/w" sandbox="allow-scripts"></iframe>
        |<iframe src="https://site.example/self"></iframe>
        |<iframe src="https://x.googlesyndication.com/ad"></iframe>""".stripMargin,
      "site.example")
    assert(fs.map(f => (f.thirdParty, f.sandboxed, f.adSlot)) ==
      Vector((true, true, false), (false, false, false), (true, false, true)))
  }
}
