package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** EXIF/TIFF IFD walker: round trips, endianness, malformed-input
  * robustness (never throws). */
class ExifSpec extends AnyFunSuite {

  test("round trip: both endians, all fields") {
    for (le <- Seq(true, false)) {
      val jpeg = Exif.buildExifJpeg("CamX", "M7", orientation = 6,
        xdim = 800, ydim = 600, dateTime = "2024:03:04 05:06:07", le = le)
      val m = Exif.parse(jpeg).get
      assert(m.endian == (if (le) "II" else "MM"))
      assert(m.orientation.contains(6))
      assert(m.make.contains("CamX") && m.model.contains("M7"))
      assert(m.exifX.contains(800L) && m.exifY.contains(600L))
      assert(m.dateTime.contains("2024:03:04 05:06:07"))
    }
  }

  test("inline vs offset ASCII slots (short model inline, long make by offset)") {
    val jpeg = Exif.buildExifJpeg("VeryLongMakerName", "ab", 1, 1, 1,
      "2024:01:01 00:00:00", le = true)
    val m = Exif.parse(jpeg).get
    assert(m.make.contains("VeryLongMakerName"))
    assert(m.model.contains("ab")) // 3 bytes incl NUL → inline slot
  }

  test("non-exif and garbage inputs return None, never throw") {
    assert(Exif.parse(null).isEmpty)
    assert(Exif.parse(Array[Byte]()).isEmpty)
    assert(Exif.parse(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xd9.toByte)).isEmpty)
    assert(Exif.parse("not a jpeg at all".getBytes).isEmpty)
    // APP0-only (JFIF without Exif)
    val jfif = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte,
      0, 4, 'J', 'F') ++ Array[Byte](0xff.toByte, 0xd9.toByte)
    assert(Exif.parse(jfif).isEmpty)
  }

  test("mutation and truncation probes: bounded, no throw") {
    val base = Exif.buildExifJpeg("Cam1", "M2", 3, 640, 480,
      "2024:01:05 12:00:00", le = true)
    val rnd = new scala.util.Random(99)
    (0 until 300).foreach { i =>
      val m = base.clone()
      if (i % 3 == 0) {
        val cut = rnd.nextInt(base.length)
        Exif.parse(java.util.Arrays.copyOf(m, cut)) // must not throw
      } else {
        (0 until 3).foreach(_ => m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte)
        Exif.parse(m) // must not throw
      }
    }
  }

  test("exifStats formulas match the oracle arithmetic") {
    val spark = graft.SparkSessionFixture.spark
    import spark.implicits._
    val out = Exif.exifStats(Seq(0L, 1L, 7L, 13L).toDF("doc_id"))
      .orderBy("doc_id")
      .as[(Long, String, Int, String, String, Long, Long, String)]
      .collect().toSeq
    assert(out(0) == ((0L, "II", 1, "Cam0", "M0", 640L, 480L, "2024:01:01 12:00:00")))
    assert(out(1) == ((1L, "MM", 2, "Cam1", "M1", 800L, 600L, "2024:01:02 12:00:00")))
    assert(out(2) == ((7L, "MM", 8, "Cam2", "M1", 1120L, 600L, "2024:01:08 12:00:00")))
    assert(out(3) == ((13L, "MM", 6, "Cam3", "M1", 800L, 600L, "2024:01:14 12:00:00")))
  }
}
