package graft.core

/** Stream filters (PDF 32000-1 §7.4). Covers the reference's SIMPLE_FILTERS
  * set — ASCIIHexDecode, ASCII85Decode, RunLengthDecode, FlateDecode,
  * LZWDecode (reference: src/pypdfium2/_helpers/pageobjects.py:319) — plus
  * PNG/TIFF predictors used by xref streams and images. DCT/JPX payloads are
  * passed through undecoded (metadata-only, like the reference's "complex"
  * filter split).
  */
object Filters {

  final case class FilterException(msg: String) extends RuntimeException(msg)
  /** Decompression-bomb cap hit — deliberately NOT a FilterException so
    * lenient corrupt-stream fallbacks (e.g. flate's raw-deflate retry)
    * never re-decode the bomb; propagates to the document error model. */
  final case class DecodeCapException(msg: String) extends RuntimeException(msg)

  /** zlib-deflate (writer-side encoder for FlateDecode payloads). */
  def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length / 2))
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Apply the full filter chain of a stream dict to its raw bytes.
    * DCTDecode/JPXDecode/CCITTFaxDecode/JBIG2Decode terminate the chain with
    * the remaining bytes returned as-is (image codecs are sink-side concerns).
    */
  def decode(dict: PdfDict, raw: Array[Byte], resolve: PdfObject => PdfObject): Array[Byte] = {
    val filters: Vector[String] = resolve(dict("Filter")) match {
      case PdfName(n) => Vector(n)
      case PdfArray(items) => items.map(resolve).collect { case PdfName(n) => n }
      case _ => Vector.empty
    }
    val parmsList: Vector[PdfObject] = resolve(dict("DecodeParms")) match {
      case d: PdfDict => Vector(d)
      case PdfArray(items) => items.map(resolve)
      case _ => Vector.empty
    }
    var out = raw
    var i = 0
    while (i < filters.length) {
      val parms = if (i < parmsList.length) parmsList(i) match {
        case d: PdfDict => d
        case _ => PdfDict.empty
      } else PdfDict.empty
      filters(i) match {
        case "FlateDecode" | "Fl" => out = predictor(flate(out), parms, resolve)
        case "LZWDecode" | "LZW" => out = predictor(lzw(out, intParam(parms, "EarlyChange", 1, resolve)), parms, resolve)
        case "ASCIIHexDecode" | "AHx" => out = asciiHex(out)
        case "ASCII85Decode" | "A85" => out = ascii85(out)
        case "RunLengthDecode" | "RL" => out = runLength(out)
        case "Crypt" => () // identity unless a named crypt filter; handled by doc loader
        case "DCTDecode" | "DCT" | "JPXDecode" | "CCITTFaxDecode" | "CCF" | "JBIG2Decode" =>
          return out // passthrough terminal codecs
        case other => throw FilterException(s"unsupported filter $other")
      }
      i += 1
    }
    out
  }

  /** Terminal (image-codec) filter name and its DecodeParms dict, if any. */
  def terminalFilter(dict: PdfDict, resolve: PdfObject => PdfObject): Option[(String, PdfDict)] = {
    val filters = filterNames(dict, resolve)
    if (filters.isEmpty) return None
    val parmsList: Vector[PdfObject] = resolve(dict("DecodeParms")) match {
      case d: PdfDict => Vector(d)
      case PdfArray(items) => items.map(resolve)
      case _ => Vector.empty
    }
    val i = filters.length - 1
    val parms = if (i < parmsList.length) parmsList(i) match {
      case d: PdfDict => d
      case _ => PdfDict.empty
    } else PdfDict.empty
    Some((filters(i), parms))
  }

  /** Names of filters applied, in application order (for image metadata —
    * reference pageobjects.py:518-540). */
  def filterNames(dict: PdfDict, resolve: PdfObject => PdfObject): Vector[String] =
    resolve(dict("Filter")) match {
      case PdfName(n) => Vector(n)
      case PdfArray(items) => items.map(resolve).collect { case PdfName(n) => n }
      case _ => Vector.empty
    }

  private def intParam(parms: PdfDict, key: String, default: Int, resolve: PdfObject => PdfObject): Int =
    resolve(parms(key)) match { case PdfNumber(v) => v.toInt; case _ => default }

  def flate(in: Array[Byte]): Array[Byte] = {
    if (in.isEmpty) return in
    val inf = new java.util.zip.Inflater()
    // tolerate leading garbage: find zlib header if the first attempt fails
    try inflateAll(inf, in)
    catch {
      case cap: DecodeCapException => throw cap
      case _: Exception =>
        // raw deflate fallback (some generators omit the zlib wrapper)
        val inf2 = new java.util.zip.Inflater(true)
        try inflateAll(inf2, in)
        catch {
          case cap: DecodeCapException => throw cap
          case _: Exception => throw FilterException("flate: corrupt stream")
        }
        finally inf2.end()
    } finally inf.end()
  }

  /** Absolute per-stage decode-output cap. Deflate's ~1000:1 ratio turns
    * a 1 MB payload into ~1 GB of heap, and /Filter CHAINS compound it —
    * the classic decompression bomb, and on a shared executor one
    * poisoned row's OOM kills every other task in the JVM. 256 MiB is far
    * above any legitimate page stream (the biggest reference-corpus
    * stream is <8 MB decoded) and far below the per-task heap budget;
    * exceeding it throws FilterException → an (ok=false, errCode) row,
    * never an executor death. Applied to the unbounded expanders (flate,
    * LZW, run-length); ASCII filters contract or expand ≤4/5-bounded. */
  private[core] val MaxDecodedBytes: Int = 1 << 28

  private def inflateAll(inf: java.util.zip.Inflater, in: Array[Byte]): Array[Byte] = {
    inf.setInput(in)
    val out = new java.io.ByteArrayOutputStream(math.max(64, in.length * 4))
    val buf = new Array[Byte](8192)
    var finished = false
    while (!finished) {
      val n = inf.inflate(buf)
      if (n > 0) {
        if (out.size() + n > MaxDecodedBytes)
          throw DecodeCapException(s"flate: output exceeds $MaxDecodedBytes bytes")
        out.write(buf, 0, n)
      }
      else if (inf.finished() || inf.needsDictionary()) finished = true
      else if (inf.needsInput()) {
        // truncated stream: keep what we decoded (lenient, like PDFium)
        finished = true
      }
    }
    out.toByteArray
  }

  def asciiHex(in: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(in.length / 2 + 1)
    var hi = -1
    var i = 0
    var done = false
    while (i < in.length && !done) {
      val c = in(i) & 0xff
      if (c == '>') done = true
      else {
        val v =
          if (c >= '0' && c <= '9') c - '0'
          else if (c >= 'a' && c <= 'f') c - 'a' + 10
          else if (c >= 'A' && c <= 'F') c - 'A' + 10
          else -1
        if (v >= 0) { if (hi < 0) hi = v else { out.write((hi << 4) | v); hi = -1 } }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4)
    out.toByteArray
  }

  def ascii85(in: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(in.length * 4 / 5 + 4)
    var tuple = 0L
    var count = 0
    var i = 0
    // skip optional <~ header
    if (in.length >= 2 && in(0) == '<' && in(1) == '~') i = 2
    var done = false
    while (i < in.length && !done) {
      val c = in(i) & 0xff
      if (c == '~') done = true
      else if (c == 'z' && count == 0) { out.write(0); out.write(0); out.write(0); out.write(0) }
      else if (c >= '!' && c <= 'u') {
        tuple = tuple * 85 + (c - '!')
        count += 1
        if (count == 5) {
          out.write(((tuple >> 24) & 0xff).toInt); out.write(((tuple >> 16) & 0xff).toInt)
          out.write(((tuple >> 8) & 0xff).toInt); out.write((tuple & 0xff).toInt)
          tuple = 0; count = 0
        }
      } // whitespace ignored
      i += 1
    }
    if (count > 0) {
      var k = count
      while (k < 5) { tuple = tuple * 85 + 84; k += 1 }
      val bytes = Array(((tuple >> 24) & 0xff).toByte, ((tuple >> 16) & 0xff).toByte,
        ((tuple >> 8) & 0xff).toByte, (tuple & 0xff).toByte)
      out.write(bytes, 0, count - 1)
    }
    out.toByteArray
  }

  def runLength(in: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(in.length * 2)
    var i = 0
    var done = false
    while (i < in.length && !done) {
      if (out.size() > MaxDecodedBytes)
        throw DecodeCapException(s"runlength: output exceeds $MaxDecodedBytes bytes")
      val l = in(i) & 0xff
      i += 1
      if (l == 128) done = true
      else if (l < 128) {
        val n = l + 1
        val take = math.min(n, in.length - i)
        out.write(in, i, take)
        i += take
      } else {
        if (i < in.length) {
          val b = in(i); i += 1
          var k = 0
          while (k < 257 - l) { out.write(b); k += 1 }
        } else done = true
      }
    }
    out.toByteArray
  }

  /** LZW decode (PDF flavor: 9..12-bit codes, EarlyChange default 1). */
  def lzw(in: Array[Byte], earlyChange: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(in.length * 3)
    val dict = new Array[Array[Byte]](4096)
    var dictSize = 258
    var codeLen = 9
    var prev: Array[Byte] = null
    var bitBuf = 0L
    var bitCnt = 0
    var i = 0
    def resetDict(): Unit = { dictSize = 258; codeLen = 9; prev = null }
    var j = 0
    while (j < 256) { dict(j) = Array(j.toByte); j += 1 }
    var done = false
    while (!done) {
      while (bitCnt < codeLen && i < in.length) { bitBuf = (bitBuf << 8) | (in(i) & 0xff); bitCnt += 8; i += 1 }
      if (bitCnt < codeLen) done = true
      else {
        val code = ((bitBuf >> (bitCnt - codeLen)) & ((1 << codeLen) - 1)).toInt
        bitCnt -= codeLen
        if (code == 256) resetDict()
        else if (code == 257) done = true
        else {
          val entry: Array[Byte] =
            if (code < dictSize && dict(code) != null) dict(code)
            else if (prev != null) prev :+ prev(0)
            else { done = true; Array.emptyByteArray }
          if (!done) {
            if (out.size() + entry.length > MaxDecodedBytes)
              throw DecodeCapException(s"lzw: output exceeds $MaxDecodedBytes bytes")
            out.write(entry, 0, entry.length)
            if (prev != null && dictSize < 4096) {
              dict(dictSize) = prev :+ entry(0)
              dictSize += 1
            }
            // early-change: width grows when entry 2^len - earlyChange exists
            if (dictSize + earlyChange >= (1 << codeLen) && codeLen < 12) codeLen += 1
            prev = entry
          }
        }
      }
    }
    out.toByteArray
  }

  /** PNG (and TIFF-2) predictors per §7.4.4.4. */
  def predictor(data: Array[Byte], parms: PdfDict, resolve: PdfObject => PdfObject): Array[Byte] = {
    val pred = intParam(parms, "Predictor", 1, resolve)
    if (pred <= 1) return data
    val colors = intParam(parms, "Colors", 1, resolve)
    val bpc = intParam(parms, "BitsPerComponent", 8, resolve)
    val columns = intParam(parms, "Columns", 1, resolve)
    val bpp = math.max(1, colors * bpc / 8)
    val rowLen = (columns * colors * bpc + 7) / 8
    if (pred == 2) { // TIFF predictor (8-bit only support)
      if (bpc == 8) {
        val out = data.clone()
        var r = 0
        while (r + rowLen <= out.length) {
          var c = bpp
          while (c < rowLen) { out(r + c) = ((out(r + c) + out(r + c - bpp)) & 0xff).toByte; c += 1 }
          r += rowLen
        }
        out
      } else data
    } else { // PNG predictors: each row prefixed with filter type byte
      val nRows = data.length / (rowLen + 1)
      val out = new Array[Byte](nRows * rowLen)
      val prevRow = new Array[Byte](rowLen)
      var r = 0
      while (r < nRows) {
        val ft = data(r * (rowLen + 1)) & 0xff
        val src = r * (rowLen + 1) + 1
        val dst = r * rowLen
        var c = 0
        while (c < rowLen) {
          val rawB = data(src + c) & 0xff
          val left = if (c >= bpp) out(dst + c - bpp) & 0xff else 0
          val up = prevRow(c) & 0xff
          val ul = if (c >= bpp) prevRow(c - bpp) & 0xff else 0
          val v = ft match {
            case 0 => rawB
            case 1 => rawB + left
            case 2 => rawB + up
            case 3 => rawB + ((left + up) >> 1)
            case 4 =>
              val p = left + up - ul
              val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
              rawB + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
            case _ => rawB
          }
          out(dst + c) = (v & 0xff).toByte
          c += 1
        }
        System.arraycopy(out, dst, prevRow, 0, rowLen)
        r += 1
      }
      out
    }
  }
}
