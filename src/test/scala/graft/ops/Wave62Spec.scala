package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 62: attachment hygiene, simhash bucket stats, seasonality. */
class Wave62Spec extends AnyFunSuite {

  lazy val spark = SparkSessionFixture.spark

  test("attachment kind: magic boundaries") {
    import Multimodal.detectAttachmentKind
    assert(detectAttachmentKind(Array.emptyByteArray) == "empty")
    assert(detectAttachmentKind("MZ".getBytes) == "pe")
    assert(detectAttachmentKind(Array[Byte](0x7f, 'E', 'L', 'F', 2)) == "elf")
    assert(detectAttachmentKind("#!/usr/bin/env python".getBytes) == "script")
    assert(detectAttachmentKind(Array[Byte]('P', 'K', 3, 4)) == "zip")
    assert(detectAttachmentKind("PK but not a zip".getBytes) == "text") // PK without \x03\x04
    assert(detectAttachmentKind("%PDF-1.7".getBytes) == "pdf")
    assert(detectAttachmentKind("café utf-8".getBytes("UTF-8")) == "text")
    assert(detectAttachmentKind(Array[Byte](0, 1, 2, 3)) == "bin")
    assert(detectAttachmentKind("M".getBytes) == "text") // too short for MZ
  }

  test("simhash bucket stats: planted identical pair collides in every combo") {
    import spark.implicits._
    val long1 = (1 to 30).map(i => s"alpha bravo charlie delta echo$i").mkString(" ")
    val other = (1 to 30).map(i => s"zulu yankee xray whiskey victor$i uniform tango").mkString(" ")
    val corpus = Seq((1L, long1), (2L, long1), (3L, other)).toDF("doc_id", "text")
    val rs = Dedup.simhashBucketStats(corpus).collect()
    assert(rs.length == 20)
    rs.foreach { r =>
      val (multi, maxB, pairs) = (r.getLong(1), r.getLong(2), r.getLong(3))
      // docs 1 and 2 are identical → same fp → same bucket in EVERY combo;
      // doc 3 may or may not collide, so bounds, not equalities
      assert(multi >= 1L && maxB >= 2L && pairs >= 1L)
      assert(maxB <= 3L && r.getLong(4) == 0L)
    }
  }

  test("seasonality: permille shares floor-sum to ≤1000, dows complete") {
    val df = graft.SparkEntry.queries("events_seasonality")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (_, rs) =>
      val share = rs.map(_.getLong(3)).sum
      assert(share <= 1000L && share > 1000L - rs.length) // floor loses <1 per row
      assert(rs.forall(r => r.getLong(1) >= 0L && r.getLong(1) <= 6L))
    }
  }
}
