package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXIF metadata extraction for image payloads — the camera-metadata
  * side of a VLM data pipeline (orientation decides whether pixels need
  * rotating before training; capture time and device feed dedup and
  * provenance filters). A REAL TIFF 6.0 IFD walker over the JPEG APP1
  * segment: both byte orders (II/MM), IFD0 → Exif-private IFD chaining,
  * inline vs offset value slots by type size, every access
  * bounds-checked so truncated/mutated payloads degrade to None fields —
  * never a throw (the FuzzSpec discipline of the PDF side).
  *
  * Scale shape: a narrow per-row parse where the scan produced the
  * payload — no shuffle, bounded work per row (segment walk stops at
  * SOS/EOI; IFD entry count is clamped).
  */
object Exif {

  final case class ExifMeta(
      endian: String,       // "II" | "MM"
      orientation: Option[Int],
      make: Option[String],
      model: Option[String],
      exifX: Option[Long],
      exifY: Option[Long],
      dateTime: Option[String])

  private def u16(b: Array[Byte], i: Int, le: Boolean): Int =
    if (le) (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    else ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def u32(b: Array[Byte], i: Int, le: Boolean): Long =
    if (le) (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    else ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  /** One IFD: map tag → (type, count, raw value slot offset). Offsets are
    * relative to the TIFF header base `base`. Returns entries plus the
    * next-IFD offset. Entry count clamped at 512 (a crafted count cannot
    * force a long scan). */
  private def readIfd(b: Array[Byte], base: Int, ifdOff: Long, le: Boolean):
      (Map[Int, (Int, Long, Int)], Long) = {
    val at = base + ifdOff.toInt
    if (ifdOff < 0 || at < 0 || at + 2 > b.length) return (Map.empty, 0L)
    val n = math.min(u16(b, at, le), 512)
    var i = 0
    val m = Map.newBuilder[Int, (Int, Long, Int)]
    while (i < n) {
      val e = at + 2 + i * 12
      if (e + 12 <= b.length) {
        val tag = u16(b, e, le)
        val typ = u16(b, e + 2, le)
        val cnt = u32(b, e + 4, le)
        m += (tag -> ((typ, cnt, e + 8)))
      }
      i += 1
    }
    val nextAt = at + 2 + n * 12
    val next = if (nextAt + 4 <= b.length) u32(b, nextAt, le) else 0L
    (m.result(), next)
  }

  private val TypeSize = Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 4, 5 -> 8,
    7 -> 1, 9 -> 4, 10 -> 8)

  /** Value bytes of an entry: inline when total size ≤ 4, else at the
    * pointed-to offset from the TIFF base. */
  private def valueBytes(b: Array[Byte], base: Int, typ: Int, cnt: Long,
                         slot: Int, le: Boolean): Option[(Int, Int)] = {
    val sz = TypeSize.getOrElse(typ, 0).toLong * cnt
    if (sz <= 0 || sz > 65536) return None
    val off = if (sz <= 4) slot else base + u32(b, slot, le).toInt
    if (off < 0 || off + sz > b.length) None else Some((off, sz.toInt))
  }

  private def shortOrLong(b: Array[Byte], base: Int,
                          e: (Int, Long, Int), le: Boolean): Option[Long] =
    valueBytes(b, base, e._1, e._2, e._3, le).flatMap { case (off, _) =>
      e._1 match {
        case 3 => Some(u16(b, off, le).toLong)
        case 4 => Some(u32(b, off, le))
        case _ => None
      }
    }

  private def ascii(b: Array[Byte], base: Int,
                    e: (Int, Long, Int), le: Boolean): Option[String] =
    if (e._1 != 2) None
    else valueBytes(b, base, e._1, e._2, e._3, le).map { case (off, sz) =>
      val end = off + sz
      var z = off
      while (z < end && b(z) != 0) z += 1
      new String(b, off, z - off, java.nio.charset.StandardCharsets.US_ASCII)
    }

  /** Parse EXIF from a JPEG payload: walk APP segments to the Exif APP1,
    * then IFD0 and the Exif-private IFD. None on anything malformed. */
  def parse(jpeg: Array[Byte]): Option[ExifMeta] = {
    val b = jpeg
    if (b == null || b.length < 4 ||
      (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var i = 2
    var app1 = -1
    var guard = 0
    while (app1 < 0 && i + 4 <= b.length && (b(i) & 0xff) == 0xff && guard < 64) {
      val marker = b(i + 1) & 0xff
      if (marker == 0xd9 || marker == 0xda) return None // EOI / SOS: no Exif
      val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
      if (len < 2 || i + 2 + len > b.length) return None
      if (marker == 0xe1 && len >= 8 &&
        b(i + 4) == 'E' && b(i + 5) == 'x' && b(i + 6) == 'i' &&
        b(i + 7) == 'f' && b(i + 8) == 0 && b(i + 9) == 0) app1 = i + 10
      else i += 2 + len
      guard += 1
    }
    if (app1 < 0 || app1 + 8 > b.length) return None
    val base = app1
    val le = b(base) == 'I' && b(base + 1) == 'I'
    val be = b(base) == 'M' && b(base + 1) == 'M'
    if (!le && !be) return None
    if (u16(b, base + 2, le) != 42) return None
    val ifd0Off = u32(b, base + 4, le)
    val (ifd0, _) = readIfd(b, base, ifd0Off, le)
    if (ifd0.isEmpty) return None
    val orientation = ifd0.get(0x0112).flatMap(shortOrLong(b, base, _, le)).map(_.toInt)
    val make = ifd0.get(0x010f).flatMap(ascii(b, base, _, le))
    val model = ifd0.get(0x0110).flatMap(ascii(b, base, _, le))
    val exifIfd = ifd0.get(0x8769).flatMap(shortOrLong(b, base, _, le))
    val sub = exifIfd.map(off => readIfd(b, base, off, le)._1).getOrElse(Map.empty)
    Some(ExifMeta(
      if (le) "II" else "MM",
      orientation,
      make, model,
      sub.get(0xa002).flatMap(shortOrLong(b, base, _, le)),
      sub.get(0xa003).flatMap(shortOrLong(b, base, _, le)),
      sub.get(0x9003).flatMap(ascii(b, base, _, le))))
  }

  // ---- deterministic synthesis (tests + oracle) --------------------------

  private def u16b(v: Int, le: Boolean): Array[Byte] =
    if (le) Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    else Array[Byte](((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def u32b(v: Long, le: Boolean): Array[Byte] =
    if (le) Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    else Array[Byte](((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** One IFD entry; `valSlot` must already be 4 bytes. */
  private def entry(tag: Int, typ: Int, cnt: Long, valSlot: Array[Byte],
                    le: Boolean): Array[Byte] =
    u16b(tag, le) ++ u16b(typ, le) ++ u32b(cnt, le) ++ valSlot

  /** Minimal EXIF JPEG: SOI + APP1(Exif: IFD0[Make, Model, Orientation,
    * ExifIFD] + ExifIFD[DateTimeOriginal, PixelX, PixelY] + string area)
    * + EOI. Both endians supported. */
  def buildExifJpeg(make: String, model: String, orientation: Int,
                    xdim: Long, ydim: Long, dateTime: String,
                    le: Boolean): Array[Byte] = {
    val makeB = (make + "\u0000").getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val modelB = (model + "\u0000").getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val dtB = (dateTime + "\u0000").getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    // layout (offsets from TIFF base): header 8 | IFD0 (2 + 4*12 + 4) |
    // ExifIFD (2 + 3*12 + 4) | make | model | dt
    val ifd0At = 8L
    val exifAt = ifd0At + 2 + 4 * 12 + 4
    val makeAt = exifAt + 2 + 3 * 12 + 4
    val modelAt = makeAt + makeB.length
    val dtAt = modelAt + modelB.length
    def strSlot(s: Array[Byte], at: Long): Array[Byte] =
      if (s.length <= 4) java.util.Arrays.copyOf(s, 4) else u32b(at, le)
    val ifd0 = u16b(4, le) ++
      entry(0x010f, 2, makeB.length, strSlot(makeB, makeAt), le) ++
      entry(0x0110, 2, modelB.length, strSlot(modelB, modelAt), le) ++
      entry(0x0112, 3, 1, u16b(orientation, le) ++ u16b(0, le), le) ++
      entry(0x8769, 4, 1, u32b(exifAt, le), le) ++
      u32b(0, le)
    val exifIfd = u16b(3, le) ++
      entry(0x9003, 2, dtB.length, u32b(dtAt, le), le) ++
      entry(0xa002, 4, 1, u32b(xdim, le), le) ++
      entry(0xa003, 4, 1, u32b(ydim, le), le) ++
      u32b(0, le)
    val tiff = (if (le) "II".getBytes else "MM".getBytes) ++ u16b(42, le) ++
      u32b(ifd0At, le) ++ ifd0 ++ exifIfd ++ makeB ++ modelB ++ dtB
    val app1Body = "Exif\u0000\u0000".getBytes(
      java.nio.charset.StandardCharsets.US_ASCII) ++ tiff
    val app1Len = app1Body.length + 2
    Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe1.toByte,
      ((app1Len >> 8) & 0xff).toByte, (app1Len & 0xff).toByte) ++
      app1Body ++ Array[Byte](0xff.toByte, 0xd9.toByte)
  }

  /** Deterministic EXIF corpus keyed on doc_id (formulas mirrored in the
    * oracle) and the extraction op over it: synthesize → parse → project.
    * The parser must INVERT the synthesis exactly for the oracle to pass;
    * robustness on malformed input is the spec's mutation probe. */
  def exifStats(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .map { d =>
        val jpeg = buildExifJpeg(
          make = s"Cam${d % 5}", model = s"M${d % 3}",
          orientation = (1 + d % 8).toInt,
          xdim = 640 + (d % 4) * 160, ydim = 480 + (d % 3) * 120,
          dateTime = f"2024:01:${1 + d % 28}%02d 12:00:00",
          le = d % 2 == 0)
        val m = parse(jpeg).get
        (d, m.endian, m.orientation.get, m.make.get, m.model.get,
          m.exifX.get, m.exifY.get, m.dateTime.get)
      }
      .toDF("doc_id", "endian", "orientation", "make", "model",
        "exif_x", "exif_y", "date_time")
  }
}
