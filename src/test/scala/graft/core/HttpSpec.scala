package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.ISO_8859_1

/** HTTP/1.x response decoding: framing, content-type parsing, chunked +
  * compressed bodies, and the adversarial degradation paths. */
class HttpSpec extends AnyFunSuite {

  private def resp(head: String, body: Array[Byte]): Array[Byte] =
    (head + "\r\n\r\n").getBytes(ISO_8859_1) ++ body

  test("identity body with content-length framing and charset extraction") {
    val r = Http.parseResponse(resp(
      "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=\"ISO-8859-4\"\r\nContent-Length: 5",
      "hello\r\n".getBytes(ISO_8859_1)))
    assert(r.ok && r.status == 200 && r.mime == "text/html" && r.charset == "iso-8859-4")
    assert(new String(r.payload, ISO_8859_1) == "hello") // padding trimmed by Content-Length
  }

  test("bare-LF header terminator tolerated; missing terminator fails") {
    val r = Http.parseResponse("HTTP/1.0 204 No Content\nServer: x\n\n".getBytes(ISO_8859_1))
    assert(r.ok && r.status == 204 && r.payload.isEmpty)
    val bad = Http.parseResponse("HTTP/1.1 200 OK\r\nContent-Type: text/html".getBytes(ISO_8859_1))
    assert(!bad.ok && bad.err == "no header terminator")
  }

  test("chunked decoding: extensions ignored, sizes in hex, trailers dropped") {
    val body = "5;ext=1\r\nhello\r\nB\r\n, chunked w\r\n0\r\nTrailer: x\r\n\r\n"
    val r = Http.parseResponse(resp(
      "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked", body.getBytes(ISO_8859_1)))
    assert(r.ok && r.chunked)
    assert(new String(r.payload, ISO_8859_1) == "hello, chunked w")
  }

  test("gzip and deflate bodies decode; zip bomb hits the budget, not the heap") {
    val payload = Array.fill[Byte](100000)('a')
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos); g.write(payload); g.close()
    val ok = Http.parseResponse(resp(
      "HTTP/1.1 200 OK\r\nContent-Encoding: gzip", bos.toByteArray))
    assert(ok.ok && ok.encoding == "gzip" && ok.payload.length == 100000)
    val bomb = Http.parseResponse(resp(
      "HTTP/1.1 200 OK\r\nContent-Encoding: gzip", bos.toByteArray), maxPayload = 1000)
    assert(!bomb.ok && bomb.err == "gzip: budget exceeded")
  }

  test("raw-DEFLATE fallback for servers that skip the zlib wrapper") {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput("raw deflate".getBytes(ISO_8859_1)); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](512)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    val r = Http.parseResponse(resp(
      "HTTP/1.1 200 OK\r\nContent-Encoding: deflate", out.toByteArray))
    assert(r.ok && new String(r.payload, ISO_8859_1) == "raw deflate")
  }

  test("redirect surfaces location; unknown content-encoding is an err row") {
    val r = Http.parseResponse(resp(
      "HTTP/1.1 302 Found\r\nLocation: https://x.example/y", Array.emptyByteArray))
    assert(r.ok && r.status == 302 && r.location == "https://x.example/y")
    val br = Http.parseResponse(resp(
      "HTTP/1.1 200 OK\r\nContent-Encoding: br", "x".getBytes(ISO_8859_1)))
    assert(!br.ok && br.err == "unsupported content-encoding: br")
  }

  test("garbage, empty, and bad chunk framing degrade to err rows") {
    assert(!Http.parseResponse(null).ok)
    assert(!Http.parseResponse(Array.emptyByteArray).ok)
    assert(!Http.parseResponse("NOTHTTP blah\r\n\r\n".getBytes(ISO_8859_1)).ok)
    val badChunk = Http.parseResponse(resp(
      "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked", "zz\r\nbody".getBytes(ISO_8859_1)))
    assert(!badChunk.ok && badChunk.err == "chunk: bad size")
    val truncChunk = Http.parseResponse(resp(
      "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked", "ff\r\nshort".getBytes(ISO_8859_1)))
    assert(!truncChunk.ok && truncChunk.err == "chunk: truncated data")
  }
}
