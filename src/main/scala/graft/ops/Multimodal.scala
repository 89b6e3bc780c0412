package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.spark.PageRow

/** Multimodal-column plumbing: binary payloads with typed metadata columns,
  * processed via init-once-per-partition typed mapPartitions (the Scala
  * analog of a batched decode UDF). The container has no image/audio codecs,
  * so decode stays at header level: real byte plumbing (magic sniffing,
  * hashing, JPEG SOF dimension parse) with the heavy-decode step stubbed as
  * a deterministic header parse — schema, partitioning, batch shape are the
  * real thing. */
object Multimodal {

  final case class PayloadMeta(
      url: String,
      n_bytes: Long,
      sha256: String,
      magic: String,
      img_w: Long,   // -1 when not a parseable image
      img_h: Long)

  def detectMagic(b: Array[Byte]): String = {
    if (b.length >= 5 && b(0) == '%' && b(1) == 'P' && b(2) == 'D' && b(3) == 'F') "pdf"
    else if (b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff) "jpeg"
    else if (b.length >= 4 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "png"
    else if (b.length >= 5 && new String(b, 0, math.min(64, b.length), java.nio.charset.StandardCharsets.ISO_8859_1)
      .toLowerCase.contains("<html")) "html"
    else "bin"
  }

  /** Executable/active-content classification for embedded-file payloads —
    * the attachment-hygiene sibling of [[detectMagic]]: PE/ELF/shebang
    * scripts and archives are what a corpus gate quarantines before a PDF's
    * attachments are trusted. `text` = first 256 bytes are all printable
    * ASCII/UTF-8-continuation; `empty` for zero-length payloads. */
  def detectAttachmentKind(b: Array[Byte]): String = {
    if (b.isEmpty) "empty"
    else if (b.length >= 2 && b(0) == 'M' && b(1) == 'Z') "pe"
    else if (b.length >= 4 && (b(0) & 0xff) == 0x7f && b(1) == 'E' && b(2) == 'L' && b(3) == 'F') "elf"
    else if (b.length >= 2 && b(0) == '#' && b(1) == '!') "script"
    else if (b.length >= 4 && b(0) == 'P' && b(1) == 'K' && b(2) == 3 && b(3) == 4) "zip"
    else {
      val m = detectMagic(b)
      if (m != "bin") m
      else {
        val n = math.min(256, b.length)
        var i = 0
        var printable = true
        while (i < n && printable) {
          val c = b(i) & 0xff
          printable = c == 0x09 || c == 0x0a || c == 0x0d || (c >= 0x20 && c != 0x7f)
          i += 1
        }
        if (printable) "text" else "bin"
      }
    }
  }

  /** JPEG dimensions from the SOF0/SOF2 marker (real header decode; the
    * pixel decode itself is the stubbed step). */
  def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
    var i = 2
    while (i + 9 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      val marker = b(i + 1) & 0xff
      val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
      if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        val h = ((b(i + 5) & 0xff) << 8) | (b(i + 6) & 0xff)
        val w = ((b(i + 7) & 0xff) << 8) | (b(i + 8) & 0xff)
        return Some((w, h))
      }
      i += 2 + len
    }
    None
  }

  final case class PageImage(
      url: String,
      page_idx: Int,
      width: Int,
      height: Int,
      ink_pct: Double,   // non-background fraction ×100, rounded to 2dp
      png: Array[Byte])

  /** Page-image generation for VLM training pipelines: rasterize each PDF
    * page inside tasks and emit PNG bytes + geometry. Narrow (no shuffle);
    * payload-heavy output rides directly to the sink. `maxPages` bounds
    * per-document work (skew guard — the 5000-page monster can't stall a
    * task indefinitely). */
  def renderPages(pages: Dataset[PageRow], scale: Double = 1.0,
                  maxPages: Int = 32, antiAlias: Boolean = false): Dataset[PageImage] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.flatMap { r =>
      if (r.html == null) Iterator.empty
      else graft.core.PdfDocument.load(r.html) match {
        case Left(_) => Iterator.empty
        case Right(doc) =>
          (0 until math.min(doc.pageCount, maxPages)).iterator.map { i =>
            val bmp = graft.core.render.Rasterizer.render(doc.page(i), scale,
              antiAlias = antiAlias)
            val ink = math.round(bmp.inkFraction * 10000).toDouble / 100
            PageImage(r.url, i, bmp.width, bmp.height, ink, bmp.toPng)
          }
      }
    }
  }

  /** Image ASSET dedup across documents — logos, headers, and tracking
    * pixels repeat in thousands of a site's PDFs; asset-level dedup keys
    * a VLM corpus on distinct image bytes, not distinct (doc, image)
    * slots. Per doc, every page's embedded images hash in-task (smart
    * extraction — decoded payload bytes, so byte-identical assets match
    * whatever their surrounding object dictionaries say); one algebraic
    * rollup on the 16-byte digest. */
  def imageAssetDedup(pages: Dataset[PageRow], maxPages: Int = 8): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.flatMap { r =>
      if (r.html == null) Iterator.empty
      else graft.core.PdfDocument.load(r.html) match {
        case Left(_) => Iterator.empty
        case Right(doc) =>
          (0 until math.min(doc.pageCount, maxPages)).iterator.flatMap { i =>
            graft.core.ImageExtract.pageImages(doc.page(i)).iterator.map { img =>
              val md5 = java.security.MessageDigest.getInstance("MD5")
                .digest(img.data).map(x => f"$x%02x").mkString
              (md5, img.format, img.width.toLong, img.height.toLong, r.url)
            }
          }
      }
    }
      .toDF("img_md5", "format", "width", "height", "url")
      .groupBy("img_md5", "format", "width", "height")
      .agg(countDistinct(col("url")).as("n_docs"),
           count(lit(1)).as("n_occurrences"))
  }

  final case class OcrRoute(url: String, page_idx: Long, n_chars: Long,
                            ink_permille: Long, needs_ocr: Boolean)

  /** Scanned-PDF routing — the OCR fork every PDF corpus hits: a page
    * with NO extractable text but visible ink is a scan (or pure
    * graphics) and must route to OCR at ~100× the cost; a page with text
    * extracts directly; a page with neither is blank padding. Both
    * signals come off ONE parse (text assembly + rasterized ink
    * fraction); narrow, zero shuffle — the router the size-routed
    * extraction composes with at 100 TB. */
  def ocrRouting(pages: Dataset[PageRow], scale: Double = 0.5,
                 maxPages: Int = 32): Dataset[OcrRoute] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.flatMap { r =>
      if (r.html == null) Iterator.empty
      else graft.core.PdfDocument.load(r.html) match {
        case Left(_) => Iterator.empty
        case Right(doc) =>
          (0 until math.min(doc.pageCount, maxPages)).iterator.map { i =>
            val nChars = graft.core.TextPage.build(doc.page(i)).text.length
            val bmp = graft.core.render.Rasterizer.render(doc.page(i), scale)
            val ink = math.round(bmp.inkFraction * 1000)
            OcrRoute(r.url, i.toLong, nChars.toLong, ink,
              nChars == 0 && ink > 0L)
          }
      }
    }
  }

  final case class VlmPair(
      url: String,
      page_idx: Long,
      width: Long,
      height: Long,
      png_md5: String,
      n_chars: Long,
      text_prefix: String)

  /** (page image, page text) training pairs — the export a VLM data
    * pipeline actually writes: per PDF page, the rendered bitmap NEXT TO
    * the extracted text of the SAME page, aligned by construction. The
    * document parses ONCE per row and both modalities come off that one
    * parse (render + text-page assembly share the object tree and fonts)
    * — running the image op and the text op separately would parse every
    * payload twice, the exact double-parse shape the fused
    * `pdf_stats_native` expression eliminated for stats. Narrow flatMap;
    * at 100 TB the pairs ride straight to the sink. Emits the png as an
    * md5 pin + geometry here; a production sink keeps the bytes. */
  def vlmPagePairs(pages: Dataset[PageRow], scale: Double = 1.0,
                   maxPages: Int = 32): Dataset[VlmPair] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.flatMap { r =>
      if (r.html == null) Iterator.empty
      else graft.core.PdfDocument.load(r.html) match {
        case Left(_) => Iterator.empty
        case Right(doc) =>
          (0 until math.min(doc.pageCount, maxPages)).iterator.map { i =>
            val bmp = graft.core.render.Rasterizer.render(doc.page(i), scale)
            val png = bmp.toPng
            val md5 = java.security.MessageDigest.getInstance("MD5")
              .digest(png).map(x => f"$x%02x").mkString
            val text = graft.core.TextPage.build(doc.page(i)).text
            VlmPair(r.url, i.toLong, bmp.width.toLong, bmp.height.toLong,
              md5, text.length.toLong,
              text.replace("\r\n", "\n").take(40))
          }
      }
    }
  }

  /** Typed audio/video metadata — the multimodal-column contract for
    * non-image payloads: the sample/frame DECODE stays stubbed (no codecs
    * in the container), but the container headers are parsed for real.
    * `duration_ms` is exact for WAV (data bytes / byte rate) and MP4
    * (mvhd duration/timescale); for MP3 it is the CBR estimate from the
    * first frame header. Unparseable payloads → magic + -1 fields. */
  final case class AvMeta(
      url: String,
      magic: String,       // wav | mp3 | mp4 | webm | ogg | flac | bin …
      container_ok: Boolean,
      channels: Int,       // -1 when the container doesn't carry it
      sample_rate: Int,
      bits: Int,
      duration_ms: Long,
      brand: String)       // mp4 ftyp major brand; "" elsewhere

  /** Audio/video container magics, extending [[detectMagic]]. */
  def detectAvMagic(b: Array[Byte]): String = {
    def ascii(off: Int, n: Int) =
      if (b.length >= off + n) new String(b, off, n, java.nio.charset.StandardCharsets.ISO_8859_1) else ""
    if (ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE") "wav"
    else if (ascii(0, 3) == "ID3") "mp3"
    else if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xe0) == 0xe0) "mp3"
    else if (ascii(4, 4) == "ftyp") "mp4"
    else if (b.length >= 4 && (b(0) & 0xff) == 0x1a && (b(1) & 0xff) == 0x45 &&
             (b(2) & 0xff) == 0xdf && (b(3) & 0xff) == 0xa3) "webm"
    else if (ascii(0, 4) == "OggS") "ogg"
    else if (ascii(0, 4) == "fLaC") "flac"
    else detectMagic(b)
  }

  private def le16(b: Array[Byte], i: Int) = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) | ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  /** WAV: walk RIFF chunks for fmt (channels/rate/bits) and data (size). */
  def wavMeta(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (b.length < 12) return None
    var i = 12
    var fmt: Option[(Int, Int, Int, Long)] = None
    var channels = -1; var rate = -1; var bits = -1; var byteRate = 0L; var dataLen = -1L
    while (i + 8 <= b.length) {
      val id = new String(b, i, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
      val len = le32(b, i + 4)
      if (id == "fmt " && i + 24 <= b.length) {
        channels = le16(b, i + 10); rate = le32(b, i + 12).toInt
        byteRate = le32(b, i + 16); bits = le16(b, i + 22)
      } else if (id == "data") dataLen = len
      // malformed/huge chunk length: stop walking (web payloads are hostile)
      if (len < 0 || len > b.length) i = b.length
      else i += 8 + len.toInt + (len.toInt & 1)
    }
    if (channels > 0 && rate > 0 && dataLen >= 0 && byteRate > 0)
      fmt = Some((channels, rate, bits, dataLen * 1000 / byteRate))
    fmt
  }

  /** MP4: top-level box walk for ftyp (brand) and moov/mvhd
    * (timescale + duration → ms). Version-0 mvhd (the common case). */
  def mp4Meta(b: Array[Byte]): Option[(String, Long)] = {
    var brand = ""
    var durMs = -1L
    def walk(start: Long, end: Long, depth: Int): Unit = {
      var i = start
      while (i + 8 <= end && depth < 4) {
        val size = be32(b, i.toInt)
        val typ = new String(b, i.toInt + 4, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
        if (size < 8) return
        val boxEnd = math.min(end, i + size)
        typ match {
          case "ftyp" if i + 12 <= end =>
            brand = new String(b, i.toInt + 8, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
          case "moov" => walk(i + 8, boxEnd, depth + 1)
          case "mvhd" if i + 28 <= end =>
            val version = b(i.toInt + 8) & 0xff
            if (version == 0) {
              val timescale = be32(b, i.toInt + 20)
              val duration = be32(b, i.toInt + 24)
              if (timescale > 0) durMs = duration * 1000 / timescale
            }
          case _ => ()
        }
        i = boxEnd
      }
    }
    if (b.length < 12) None
    else { walk(0, b.length, 0); if (brand.nonEmpty) Some((brand, durMs)) else None }
  }

  private val Mp3Bitrates = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3Rates = Array(44100, 48000, 32000)

  /** MP3: skip an ID3v2 tag (syncsafe size), parse the first MPEG1-Layer3
    * frame header → (channels, sample rate, CBR duration estimate). */
  def mp3Meta(b: Array[Byte]): Option[(Int, Int, Long)] = {
    var i = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3')
      i = 10 + (((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) | ((b(8) & 0x7f) << 7) | (b(9) & 0x7f))
    if (i + 4 > b.length) return None
    val h = be32(b, i)
    // MPEG1 Layer3: sync ++ version 11 ++ layer 01
    if ((h & 0xffe00000L) != 0xffe00000L || ((h >> 19) & 3) != 3 || ((h >> 17) & 3) != 1) return None
    val bitrateIdx = ((h >> 12) & 0xf).toInt
    val rateIdx = ((h >> 10) & 3).toInt
    if (bitrateIdx == 0 || bitrateIdx == 15 || rateIdx == 3) return None
    val mode = ((h >> 6) & 3).toInt
    val channels = if (mode == 3) 1 else 2
    val kbps = Mp3Bitrates(bitrateIdx)
    val durMs = (b.length - i).toLong * 8 / kbps // CBR estimate
    Some((channels, Mp3Rates(rateIdx), durMs))
  }

  /** Typed A/V metadata over the binary column — same init-once typed
    * mapPartitions shape as [[payloadStats]]; no shuffle. */
  def avPayloadMeta(pages: Dataset[PageRow]): Dataset[AvMeta] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.map { r =>
      val b = if (r.html == null) Array.emptyByteArray else r.html
      val magic = detectAvMagic(b)
      try magic match {
        case "wav" => wavMeta(b) match {
          case Some((ch, sr, bits, dur)) => AvMeta(r.url, magic, true, ch, sr, bits, dur, "")
          case None => AvMeta(r.url, magic, false, -1, -1, -1, -1L, "")
        }
        case "mp4" => mp4Meta(b) match {
          case Some((brand, dur)) => AvMeta(r.url, magic, true, -1, -1, -1, dur, brand)
          case None => AvMeta(r.url, magic, false, -1, -1, -1, -1L, "")
        }
        case "mp3" => mp3Meta(b) match {
          case Some((ch, sr, dur)) => AvMeta(r.url, magic, true, ch, sr, -1, dur, "")
          case None => AvMeta(r.url, magic, false, -1, -1, -1, -1L, "")
        }
        case m => AvMeta(r.url, m, false, -1, -1, -1, -1L, "")
      } catch { case _: Exception => AvMeta(r.url, magic, false, -1, -1, -1, -1L, "") }
    }
  }

  /** Deterministic A/V payload builders (SynthPdf's audio/video sibling):
    * used by specs and by the `av_payload_stats` oracle query — fields are
    * pinned by construction. */
  object SynthAv {
    private def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    private def le32(v: Int) = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    private def be32(v: Int) = le32(v).reverse
    private def s(t: String) = t.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

    /** 2ch/8kHz/16-bit PCM with `dataLen` data bytes (duration = dataLen/32 ms). */
    def wavBytes(dataLen: Int): Array[Byte] =
      s("RIFF") ++ le32(36 + dataLen) ++ s("WAVE") ++
        s("fmt ") ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(8000) ++
        le32(8000 * 2 * 2) ++ le16(4) ++ le16(16) ++
        s("data") ++ le32(dataLen) ++ Array.fill[Byte](dataLen)(0)

    /** isom MP4 with mvhd timescale 1000, duration `durTs` (= durTs ms). */
    def mp4Bytes(durTs: Int): Array[Byte] = {
      val mvhd = be32(108) ++ s("mvhd") ++ Array[Byte](0, 0, 0, 0) ++
        be32(0) ++ be32(0) ++ be32(1000) ++ be32(durTs) ++ Array.fill[Byte](108 - 28)(0)
      val moov = be32(8 + mvhd.length) ++ s("moov") ++ mvhd
      be32(16) ++ s("ftyp") ++ s("isom") ++ be32(0) ++ moov
    }

    /** ID3v2 (empty) + one MPEG1-Layer3 128kbps/44100 stereo frame header,
      * padded to `total` bytes (CBR duration = (total-10)*8/128 ms). */
    def mp3Bytes(total: Int): Array[Byte] =
      (s("ID3") ++ Array[Byte](3, 0, 0, 0, 0, 0, 0) ++
        Array[Byte](0xFF.toByte, 0xFB.toByte, 0x90.toByte, 0x00)).padTo(total, 0.toByte)

    /** Video MP4 with a full sample table (mdhd/stts/stsz/stsc/stco):
      * `sizes` samples at fixed `delta` ticks, laid out in TWO chunks split
      * at `chunkSplit` with `gap` dead bytes between them inside mdat — so
      * correct enumeration requires resolving stsc runs and per-chunk stco
      * bases, not assuming contiguity. Sample i's byte j = (i·31+j·7)&255. */
    def mp4VideoBytes(sizes: Seq[Int], timescale: Int = 600, delta: Int = 60,
                      chunkSplit: Int = 2, gap: Int = 4): Array[Byte] = {
      val n = sizes.length
      def full(t: String, payload: Array[Byte]) = be32(8 + payload.length) ++ s(t) ++ payload
      val vflags = Array[Byte](0, 0, 0, 0)
      val mdhd = full("mdhd", vflags ++ be32(0) ++ be32(0) ++ be32(timescale) ++ be32(n * delta))
      val stts = full("stts", vflags ++ be32(1) ++ be32(n) ++ be32(delta))
      val stsz = full("stsz", vflags ++ be32(0) ++ be32(n) ++ sizes.toArray.flatMap(be32))
      val stsc = full("stsc", vflags ++ be32(2) ++
        be32(1) ++ be32(chunkSplit) ++ be32(1) ++
        be32(2) ++ be32(n - chunkSplit) ++ be32(1))
      def moovWith(o1: Int, o2: Int) = {
        val stco = full("stco", vflags ++ be32(2) ++ be32(o1) ++ be32(o2))
        full("moov", full("trak", full("mdia", mdhd ++ full("minf", full("stbl", stts ++ stsz ++ stsc ++ stco)))))
      }
      val ftyp = be32(16) ++ s("ftyp") ++ s("isom") ++ be32(0)
      val payloadStart = ftyp.length + moovWith(0, 0).length + 8
      val o1 = payloadStart
      val o2 = payloadStart + sizes.take(chunkSplit).sum + gap
      def sample(i: Int) = Array.tabulate[Byte](sizes(i))(j => ((i * 31 + j * 7) & 0xff).toByte)
      val mdatPayload = (0 until chunkSplit).toArray.flatMap(sample) ++
        Array.fill[Byte](gap)(0) ++ (chunkSplit until n).toArray.flatMap(sample)
      ftyp ++ moovWith(o1, o2) ++ full("mdat", mdatPayload)
    }
  }

  /** PNG dimensions from the IHDR chunk (bytes 16..23 after the signature). */
  def pngDims(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 24) return None
    def be32(i: Int) = ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
    if (new String(b, 12, 4, java.nio.charset.StandardCharsets.ISO_8859_1) != "IHDR") None
    else Some((be32(16), be32(20)))
  }

  final case class Mp4Sample(idx: Int, tsMs: Long, off: Long, size: Long)

  /** Parse the MP4 sample tables (ISO 14496-12 stbl: stts time-to-sample,
    * stsz sizes, stsc sample-to-chunk, stco chunk offsets) and enumerate
    * every sample's (index, decode timestamp ms, absolute byte offset,
    * size). Handles the general multi-chunk layout: stsc runs are expanded
    * per chunk, offsets accumulate within a chunk from its stco base — so
    * non-contiguous chunks (padding between them) resolve correctly.
    * Bounds-checked throughout; malformed tables → empty (never throws). */
  def mp4Samples(b: Array[Byte]): Vector[Mp4Sample] = {
    var timescale = 0L
    var stts = Vector.empty[(Long, Long)]      // (count, delta)
    var sizes = Vector.empty[Long]
    var stsc = Vector.empty[(Long, Long)]      // (first_chunk, samples_per_chunk)
    var stco = Vector.empty[Long]
    def u32(i: Int): Long = be32(b, i)
    def walk(start: Long, end: Long, depth: Int): Unit = {
      var i = start
      while (i + 8 <= end && depth < 8) {
        val size = u32(i.toInt)
        if (size < 8 || i + size > end) return
        val typ = new String(b, i.toInt + 4, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
        val p = i.toInt + 8
        val boxEnd = i + size
        typ match {
          case "moov" | "trak" | "mdia" | "minf" | "stbl" => walk(i + 8, boxEnd, depth + 1)
          case "mdhd" if p + 16 <= boxEnd =>
            if ((b(p) & 0xff) == 0) timescale = u32(p + 12)
          case "stts" if p + 8 <= boxEnd =>
            val n = u32(p + 4).toInt
            stts = (0 until n).takeWhile(k => p + 8 + k * 8 + 8 <= boxEnd)
              .map(k => (u32(p + 8 + k * 8), u32(p + 12 + k * 8))).toVector
          case "stsz" if p + 12 <= boxEnd =>
            val fixed = u32(p + 4)
            val n = u32(p + 8).toInt
            sizes =
              if (fixed > 0) Vector.fill(n)(fixed)
              else (0 until n).takeWhile(k => p + 12 + k * 4 + 4 <= boxEnd)
                .map(k => u32(p + 12 + k * 4)).toVector
          case "stsc" if p + 8 <= boxEnd =>
            val n = u32(p + 4).toInt
            stsc = (0 until n).takeWhile(k => p + 8 + k * 12 + 12 <= boxEnd)
              .map(k => (u32(p + 8 + k * 12), u32(p + 12 + k * 12))).toVector
          case "stco" if p + 8 <= boxEnd =>
            val n = u32(p + 4).toInt
            stco = (0 until n).takeWhile(k => p + 8 + k * 4 + 4 <= boxEnd)
              .map(k => u32(p + 8 + k * 4)).toVector
          case _ => ()
        }
        i = boxEnd
      }
    }
    if (b.length < 16) return Vector.empty
    try walk(0, b.length, 0) catch { case _: Exception => return Vector.empty }
    if (timescale <= 0 || sizes.isEmpty || stsc.isEmpty || stco.isEmpty) return Vector.empty
    // expand stsc runs into per-chunk sample counts over the stco chunks
    val perChunk = stco.indices.map { ci =>
      val chunk1 = ci + 1L
      stsc.takeWhile(_._1 <= chunk1).lastOption.map(_._2).getOrElse(0L)
    }
    // decode timestamps from stts deltas
    val deltas = stts.flatMap { case (n, d) => Vector.fill(math.min(n, sizes.length.toLong).toInt)(d) }
    val out = Vector.newBuilder[Mp4Sample]
    var s = 0
    var dts = 0L
    var ci = 0
    while (ci < stco.length && s < sizes.length) {
      var within = 0L
      var off = stco(ci)
      while (within < perChunk(ci) && s < sizes.length) {
        out += Mp4Sample(s, dts * 1000 / timescale, off, sizes(s))
        off += sizes(s)
        dts += (if (s < deltas.length) deltas(s) else 0L)
        within += 1
        s += 1
      }
      ci += 1
    }
    out.result()
  }

  final case class FrameSample(
      url: String,
      sample_idx: Long,
      ts_ms: Long,
      byte_off: Long,
      n_bytes: Long,
      sample_md5: String)

  /** Frame-sampling plumbing for video payloads: every `every`-th sample's
    * byte range is located via the REAL sample-table math and the slice
    * hashed — the Spark side of a VLM frame-extraction pipeline (schema,
    * narrow per-row shape, per-doc bounded output). The pixel DECODE of the
    * slice is the honestly-stubbed step (no video codec in the container);
    * the md5 proves the right bytes were addressed. Slices that fall
    * outside the payload are dropped (truncated file), never thrown. */
  def frameSamples(pages: Dataset[PageRow], every: Int = 3): Dataset[FrameSample] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { r =>
        val b = if (r.html == null) Array.emptyByteArray else r.html
        if (detectAvMagic(b) != "mp4") Iterator.empty
        else mp4Samples(b).iterator
          .filter(s => s.idx % every == 0 && s.off + s.size <= b.length && s.size > 0)
          .map { s =>
            md.reset()
            md.update(b, s.off.toInt, s.size.toInt)
            FrameSample(r.url, s.idx.toLong, s.tsMs, s.off, s.size,
              md.digest().map(x => f"$x%02x").mkString)
          }
      }
    }
  }

  /** Typed metadata extraction over the binary column. Init-once pattern:
    * the digest instance lives per partition, not per row. */
  def payloadStats(pages: Dataset[PageRow]): Dataset[PayloadMeta] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.map { r =>
        val b = if (r.html == null) Array.emptyByteArray else r.html
        md.reset()
        val sha = md.digest(b).map(x => f"$x%02x").mkString
        val dims = detectMagic(b) match {
          case "jpeg" => jpegDims(b)
          case "png" => pngDims(b)
          case _ => None
        }
        PayloadMeta(r.url, b.length.toLong, sha, detectMagic(b),
          dims.map(_._1.toLong).getOrElse(-1L), dims.map(_._2.toLong).getOrElse(-1L))
      }
    }
  }

  /** 64-bit difference hash (dHash, public perceptual-hash technique) of a
    * rendered bitmap: 9×8 block-averaged integer grayscale, bit (r,c) set
    * iff cell(r,c) > cell(r,c+1). Pure integer arithmetic — deterministic
    * across partitionings and engines. Robust to re-encoding and metadata
    * churn (the VISUAL content decides), unlike byte digests. */
  def dhash64(bmp: graft.core.render.Bitmap): Long = {
    val gw = 9; val gh = 8
    val sums = new Array[Long](gh * gw)
    val cnts = new Array[Long](gh * gw)
    var y = 0
    while (y < bmp.height) {
      val r = y * gh / bmp.height
      var x = 0
      while (x < bmp.width) {
        val c = x * gw / bmp.width
        val px = bmp.buf(y * bmp.width + x)
        val gray = (299L * ((px >> 16) & 0xff) + 587L * ((px >> 8) & 0xff) +
          114L * (px & 0xff)) / 1000L
        sums(r * gw + c) += gray
        cnts(r * gw + c) += 1
        x += 1
      }
      y += 1
    }
    var h = 0L
    var r = 0
    while (r < gh) {
      var c = 0
      while (c < gw - 1) {
        val a = if (cnts(r * gw + c) == 0) 0L else sums(r * gw + c) / cnts(r * gw + c)
        val b = if (cnts(r * gw + c + 1) == 0) 0L else sums(r * gw + c + 1) / cnts(r * gw + c + 1)
        if (a > b) h |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    h
  }

  /** Page-level PERCEPTUAL dedup: dHash every rendered page, count how
    * many distinct documents share each hash — catches re-saved /
    * re-compressed / metadata-touched duplicates whose bytes (and byte
    * digests) all differ but whose pixels agree. Rendering is in-task
    * (narrow, maxPages-capped); only (url, page, 8-byte hash) rows reach
    * the hash-keyed rollup. */
  def pagePhash(pages: Dataset[PageRow], scale: Double = 0.5,
                maxPages: Int = 4): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val hashes = pages.flatMap { r =>
      if (r.html == null) Iterator.empty
      else graft.core.PdfDocument.load(r.html) match {
        case Left(_) => Iterator.empty
        case Right(doc) =>
          (0 until math.min(doc.pageCount, maxPages)).iterator.map { i =>
            val bmp = graft.core.render.Rasterizer.render(doc.page(i), scale)
            (r.url, i.toLong, f"${dhash64(bmp)}%016x")
          }
      }
    }.toDF("url", "page_idx", "phash")
    val reuse = hashes.groupBy(col("phash"))
      .agg(countDistinct(col("url")).as("n_docs_with_hash"))
    hashes.join(reuse, "phash")
      .select("url", "page_idx", "phash", "n_docs_with_hash")
  }
}
