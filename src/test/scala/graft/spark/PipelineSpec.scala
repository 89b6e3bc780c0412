package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSessionFixture

/** End-to-end pipeline semantics: extraction over the synthesized skewed
  * table, per-partition metrics, watermark resume, streaming carrier. */
class PipelineSpec extends AnyFunSuite {

  lazy val spark = SparkSessionFixture.spark

  test("extraction over synthesized corpus: all ok, deterministic totals") {
    import spark.implicits._
    val pages = PagesTable.synthesize(spark, 130, 8)
    val ext = ExtractPipeline.extract(pages).cache()
    try {
      assert(ext.count() == 130)
      assert(ext.where(!col("ok")).count() == 0)
      // arithmetic from per-fixture constants pinned in TextPageSpec/oracles
      val agg = ext.agg(sum("n_pages"), sum("n_chars")).collect()(0)
      assert(agg.getLong(0) == 282, s"pages=${agg.getLong(0)}")
      assert(agg.getLong(1) == 23982, s"chars=${agg.getLong(1)}")
      // byte-identity on the flagship doc rows
      val textRows = ext.where(col("url").startsWith("fixture://text.pdf")).select("text").as[String].collect()
      val golden = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/root/reference/tests/expectations/text_extract.txt")), "UTF-8")
      assert(textRows.nonEmpty && textRows.forall(_ == golden))
    } finally ext.unpersist()
  }

  test("salted extraction produces identical results to narrow plan") {
    import spark.implicits._
    val pages = PagesTable.synthesize(spark, 60, 4)
    val a = ExtractPipeline.extract(pages).select("url", "n_chars").as[(String, Long)].collect().toMap
    val b = ExtractPipeline.extractSalted(pages, salt = 3).select("url", "n_chars").as[(String, Long)].collect().toMap
    assert(a == b)
  }

  test("size-routed extraction: identical results, heavy rows routed to shuffled branch") {
    import spark.implicits._
    val pages = PagesTable.synthesize(spark, 60, 4) // includes 233 KB multipage.pdf heavies
    val a = ExtractPipeline.extract(pages).select("url", "n_chars").as[(String, Long)].collect().toMap
    val routed = ExtractPipeline.extractSizeRouted(pages, heavyBytes = 100 << 10)
    val b = routed.select("url", "n_chars").as[(String, Long)].collect().toMap
    assert(a == b)
    // the branch column is the lineage disambiguator (collision-proof at
    // any partition count — ADVICE r4): heavy docs report "salted", small
    // docs "narrow", and the (branch, partition_id) pairs never merge two
    // tasks because union-stage task ids are disjoint across branches
    val rows = routed.select("url", "branch", "partition_id").as[(String, String, Int)].collect()
    assert(rows.forall { case (url, branch, _) =>
      branch == (if (url.startsWith("fixture://multipage.pdf")) "salted" else "narrow")
    })
    val heavyIds = rows.collect { case (_, "salted", pid) => pid }.toSet
    val lightIds = rows.collect { case (_, "narrow", pid) => pid }.toSet
    assert(heavyIds.nonEmpty && lightIds.nonEmpty)
    assert(heavyIds.size <= spark.sessionState.conf.numShufflePartitions)
  }

  test("metrics table: one row per partition, totals add up") {
    val pages = PagesTable.synthesize(spark, 96, 6)
    val ext = ExtractPipeline.extract(pages)
    val m = ExtractPipeline.metrics(ext, "t").collect()
    assert(m.length == 6)
    assert(m.map(r => r.getAs[Long]("docs")).sum == 96)
    assert(m.forall(r => r.getAs[Long]("decode_failures") == 0L))
  }

  test("watermark resume: second run only processes pending buckets") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("resume").toString
    val pages = PagesTable.synthesize(spark, 40, 4)
    // run only group 0 of 2 (simulates a crash after the first commit)
    val withBucket = ResumableExtract.bucketed(pages, 8)
    val firstSlice = withBucket.filter(pmod(col("bucket"), lit(2)) === 0)
    ExtractPipeline.extract(firstSlice.drop("bucket").as[PageRow])
      .write.mode("append").parquet(s"$tmp/out")
    firstSlice.select("bucket").distinct()
      .write.mode("append").parquet(s"$tmp/wm")
    val doneUrls = spark.read.parquet(s"$tmp/out").count()
    // resume: pending = everything not in committed buckets
    val pending = ResumableExtract.pending(pages, 8, s"$tmp/wm")
    assert(pending.count() == 40 - doneUrls)
    // completing the run covers all urls exactly once
    ExtractPipeline.extract(pending).write.mode("append").parquet(s"$tmp/out")
    val all = spark.read.parquet(s"$tmp/out")
    assert(all.count() == 40)
    assert(all.select("url").distinct().count() == 40)
  }

  test("structured-streaming carrier: AvailableNow + checkpoint resume") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("stream").toString
    val in = s"$tmp/in"; val out = s"$tmp/out"; val cp = s"$tmp/cp"
    PagesTable.synthesize(spark, 20, 2).write.mode("append").parquet(in)
    StreamingExtract.run(spark, in, out, cp)
    assert(spark.read.parquet(out).count() == 20)
    // new files arrive; checkpoint ensures only they are processed
    PagesTable.synthesize(spark, 30, 2).filter(col("url").isNotNull)
      .withColumn("url", concat(lit("b2-"), col("url"))).as[PageRow]
      .write.mode("append").parquet(in)
    StreamingExtract.run(spark, in, out, cp)
    val res = spark.read.parquet(out)
    assert(res.count() == 50)
    assert(res.select("url").distinct().count() == 50)
  }
}
