package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import graft.core.Http

/** DataFrame surface over [[graft.core.Http]]: decode raw HTTP response
  * bytes (Common-Crawl WARC `response` bodies) to the actual page payload.
  *
  * Scale shape: a narrow typed map — each response decodes where the scan
  * produced it, only the decoded fields and a payload digest leave the
  * row. Decompression is budget-capped per row, so a crafted bomb costs
  * one bounded buffer and an err row, never an executor. */
object HttpOps {

  final case class HttpRow(
      name: String,
      ok: Boolean,
      err: String,
      status: Int,
      mime: String,
      charset: String,
      encoding: String,
      chunked: Boolean,
      location: String,
      n_bytes: Long,
      payload_md5: String)

  /** (name, response_bytes) → decoded row. Narrow, zero Exchange. */
  def parse(responses: DataFrame, maxPayload: Int = 64 << 20): DataFrame = {
    val spark = responses.sparkSession
    import spark.implicits._
    responses.select("name", "bytes").as[(String, Array[Byte])].map { case (name, bytes) =>
      val r = Http.parseResponse(bytes, maxPayload)
      HttpRow(name, r.ok, r.err, r.status, r.mime, r.charset, r.encoding,
        r.chunked, r.location, r.payload.length.toLong,
        if (r.payload.isEmpty) "" else Dedup.md5Hex(new String(r.payload, ISO_8859_1)))
    }.toDF()
  }

  /** Deterministic response fixtures covering the decode matrix: identity,
    * gzip, deflate (zlib), chunked, chunked+gzip, Content-Length framing
    * with trailing padding, a 301 with Location, and three adversarial
    * rows (no terminator, bad chunk size, truncated gzip) that must
    * degrade to err rows. Payloads are pure-ASCII formula text so the
    * DuckDB oracle recomputes every md5 from the same plaintext. */
  def synthResponses(spark: SparkSession): DataFrame = {
    import spark.implicits._
    def payload(n: Int): String = (0 until n).map(i => s"line $i of body;").mkString
    def resp(status: String, headers: Seq[String], body: Array[Byte]): Array[Byte] = {
      val head = (s"HTTP/1.1 $status" +: headers).mkString("", "\r\n", "\r\n\r\n")
      head.getBytes(ISO_8859_1) ++ body
    }
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos); g.write(b); g.close()
      bos.toByteArray
    }
    def zlib(b: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(b); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    }
    def chunk(b: Array[Byte], sizes: Seq[Int]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var pos = 0
      sizes.foreach { s =>
        val n = math.min(s, b.length - pos)
        if (n > 0) {
          out.write(s"${n.toHexString}\r\n".getBytes(ISO_8859_1))
          out.write(b, pos, n); out.write("\r\n".getBytes(ISO_8859_1))
          pos += n
        }
      }
      out.write("0\r\n\r\n".getBytes(ISO_8859_1))
      out.toByteArray
    }
    val p40 = payload(40).getBytes(UTF_8)
    val p7 = payload(7).getBytes(UTF_8)
    val rows = Seq[(String, Array[Byte])](
      ("identity", resp("200 OK",
        Seq("Content-Type: text/html; charset=UTF-8", s"Content-Length: ${p40.length}"), p40)),
      ("gzip", resp("200 OK",
        Seq("Content-Type: text/html; charset=utf-8", "Content-Encoding: gzip"), gz(p40))),
      ("deflate", resp("200 OK",
        Seq("Content-Type: application/json", "Content-Encoding: deflate"), zlib(p7))),
      ("chunked", resp("200 OK",
        Seq("Content-Type: text/plain", "Transfer-Encoding: chunked"),
        chunk(p40, Seq(100, 17, 1000)))),
      ("chunked_gzip", resp("200 OK",
        Seq("Content-Type: text/html", "Content-Encoding: gzip", "Transfer-Encoding: chunked"),
        chunk(gz(p40), Seq(50, 50, 1000)))),
      ("clen_padded", resp("200 OK",
        Seq("Content-Type: text/html", s"Content-Length: ${p7.length}"),
        p7 ++ "\r\n\r\n".getBytes(ISO_8859_1))),
      ("redirect", resp("301 Moved Permanently",
        Seq("Location: https://example.org/new", "Content-Length: 0"), Array.emptyByteArray)),
      ("bad_no_terminator", "HTTP/1.1 200 OK\r\nContent-Type: text/html".getBytes(ISO_8859_1)),
      ("bad_chunk", resp("200 OK", Seq("Transfer-Encoding: chunked"),
        "zz\r\nbody".getBytes(ISO_8859_1))),
      ("bad_gzip", resp("200 OK", Seq("Content-Encoding: gzip"),
        gz(p7).take(8))))
    rows.toDF("name", "bytes")
  }
}
