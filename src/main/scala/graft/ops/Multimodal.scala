package graft.ops

import org.apache.spark.sql.Dataset
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
                  maxPages: Int = 32): Dataset[PageImage] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.flatMap { r =>
      if (r.html == null) Iterator.empty
      else graft.core.PdfDocument.load(r.html) match {
        case Left(_) => Iterator.empty
        case Right(doc) =>
          (0 until math.min(doc.pageCount, maxPages)).iterator.map { i =>
            val bmp = graft.core.render.Rasterizer.render(doc.page(i), scale)
            val ink = math.round(bmp.inkFraction * 10000).toDouble / 100
            PageImage(r.url, i, bmp.width, bmp.height, ink, bmp.toPng)
          }
      }
    }
  }

  /** PNG dimensions from the IHDR chunk (bytes 16..23 after the signature). */
  def pngDims(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 24) return None
    def be32(i: Int) = ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
    if (new String(b, 12, 4, java.nio.charset.StandardCharsets.ISO_8859_1) != "IHDR") None
    else Some((be32(16), be32(20)))
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
}
