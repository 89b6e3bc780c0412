package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSessionFixture

class EventStreamsSpec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  private def stageEvents(): String = {
    val tmp = java.nio.file.Files.createTempDirectory("events").toString
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .write.mode("overwrite").parquet(s"$tmp/in")
    s"$tmp/in"
  }

  test("watermarked windowed counts: streaming closes exactly the watermark-passed windows") {
    val in = stageEvents()
    val tmp = java.nio.file.Files.createTempDirectory("wc").toString
    EventStreams.windowedCounts(spark, in, s"$tmp/out", s"$tmp/cp")
    val streamed = spark.read.parquet(s"$tmp/out")
    val batch = EventStreams.windowedCountsBatch(spark, in)
    // append-mode emits only windows older than the final watermark
    val maxTs = spark.read.parquet(in)
      .agg(max(col("ts").cast("timestamp"))).collect()(0).getTimestamp(0)
    val cutoff = new java.sql.Timestamp(maxTs.getTime - 2L * 3600 * 1000)
    val expected = batch.where(col("w_start") < lit(cutoff))
    // every streamed row must match the batch computation exactly
    val joined = streamed.join(batch, Seq("event_type", "w_start"), "left_anti")
    assert(joined.count() == 0, "streamed rows disagree with batch")
    assert(streamed.count() >= expected.count() - 1) // boundary window tolerance
    assert(streamed.count() > 10)
  }

  test("stream-stream interval join (watermarked) equals the batch conversion window") {
    val in = stageEvents()
    val tmp = java.nio.file.Files.createTempDirectory("cw").toString
    EventStreams.conversionWindowStream(spark, in, s"$tmp/out", s"$tmp/cp",
      windowMinutes = 120)
    val streamed = spark.read.parquet(s"$tmp/out")
    val batch = graft.ops.Relational.conversionWindow(
      spark.read.parquet(in).withColumn("ts", col("ts").cast("timestamp")),
      windowMinutes = 120)
    val keys = Seq("user_id", "click_id", "purchase_id", "lag_sec")
    assert(streamed.count() == batch.count())
    assert(streamed.join(batch, keys, "left_anti").count() == 0,
      "streamed rows missing from batch result")
    assert(batch.join(streamed, keys, "left_anti").count() == 0,
      "batch rows missing from streamed result")
    assert(streamed.count() >= 9) // sf0.001 ground truth
  }

  test("stateful sessionization (flatMapGroupsWithState) equals batch sessionization") {
    import spark.implicits._
    val in = stageEvents()
    val tmp = java.nio.file.Files.createTempDirectory("sess").toString
    EventStreams.sessionize(spark, in, s"$tmp/out", s"$tmp/cp")
    val streamed = spark.read.parquet(s"$tmp/out")
      .select("user_id", "n_events", "first_ts", "last_ts")
      .as[(Long, Long, java.sql.Timestamp, java.sql.Timestamp)].collect().toSet
    val batch = EventStreams.sessionizeBatch(spark, in)
      .select(col("user_id"), col("n_events"), col("first_ts"), col("last_ts"))
      .as[(Long, Long, java.sql.Timestamp, java.sql.Timestamp)].collect().toSet
    assert(streamed == batch, s"streamed=${streamed.size} batch=${batch.size}")
    assert(batch.nonEmpty)
  }

  test("streaming exact dedup: first-seen rows pass, later duplicates drop across batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def row(url: String, t: Long, payload: String) =
      PageRow(url, new java.sql.Timestamp(t), payload.getBytes("UTF-8"), null, "la")
    val source = MemoryStream[PageRow]
    val tmp = java.nio.file.Files.createTempDirectory("sdedup").toString
    val q = EventStreams.streamingExactDedup(source.toDS())
      .writeStream.format("memory").queryName("sdedup_out")
      .option("checkpointLocation", s"$tmp/cp")
      .outputMode("update")
      .start()
    try {
      // batch 1: A twice (in-batch dup), B once
      source.addData(row("u/a1", 1000, "payload-A"), row("u/a2", 2000, "payload-A"),
        row("u/b", 1500, "payload-B"))
      q.processAllAvailable()
      val b1 = spark.table("sdedup_out").as[EventStreams.SeenDoc].collect()
      assert(b1.length == 2, s"batch1: ${b1.toSeq}")
      // in-batch dup resolves to the EARLIEST timestamp
      assert(b1.find(_.url.startsWith("u/a")).get.url == "u/a1")
      // batch 2: A again (cross-batch dup, dropped) + C (new)
      source.addData(row("u/a3", 3000, "payload-A"), row("u/c", 3500, "payload-C"))
      q.processAllAvailable()
      val all = spark.table("sdedup_out").as[EventStreams.SeenDoc].collect()
      assert(all.length == 3, s"after batch2: ${all.toSeq}")
      assert(all.map(_.url).toSet == Set("u/a1", "u/b", "u/c"))
    } finally q.stop()
  }

  test("streaming change feed: new/changed/unchanged across batches, in-batch ts order") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def row(url: String, t: Long, payload: String) =
      PageRow(url, new java.sql.Timestamp(t), payload.getBytes("UTF-8"), null, "la")
    val source = MemoryStream[PageRow]
    val tmp = java.nio.file.Files.createTempDirectory("schange").toString
    val q = EventStreams.streamingChangeFeed(source.toDS())
      .writeStream.format("memory").queryName("schange_out")
      .option("checkpointLocation", s"$tmp/cp")
      .outputMode("append")
      .start()
    try {
      // batch 1: u1 fetched twice IN one batch (v1 then v2, out of arrival
      // order), u2 once
      source.addData(row("u1", 2000, "v2"), row("u1", 1000, "v1"), row("u2", 1500, "x"))
      q.processAllAvailable()
      val b1 = spark.table("schange_out").as[EventStreams.FetchStatus].collect()
      assert(b1.map(f => (f.url, f.ts.getTime, f.status)).sortBy(x => (x._1, x._2)).toVector ==
        Vector(("u1", 1000L, "new"), ("u1", 2000L, "changed"), ("u2", 1500L, "new")))
      // batch 2: u1 refetched with batch-1's last bytes (unchanged), then
      // changed again; u2 same bytes (unchanged); u3 new
      source.addData(row("u1", 3000, "v2"), row("u1", 4000, "v3"),
        row("u2", 3500, "x"), row("u3", 3600, "z"))
      q.processAllAvailable()
      val all = spark.table("schange_out").as[EventStreams.FetchStatus].collect()
      val b2 = all.filter(_.ts.getTime >= 3000).map(f => (f.url, f.ts.getTime, f.status))
        .sortBy(x => (x._1, x._2)).toVector
      assert(b2 == Vector(("u1", 3000L, "unchanged"), ("u1", 4000L, "changed"),
        ("u2", 3500L, "unchanged"), ("u3", 3600L, "new")))
    } finally q.stop()
  }

  test("streaming rate limiter: token bucket per domain, event-time refill, cross-batch state") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def row(url: String, t: Long) =
      PageRow(url, new java.sql.Timestamp(t), Array.empty[Byte], null, "la")
    val source = MemoryStream[PageRow]
    val tmp = java.nio.file.Files.createTempDirectory("srate").toString
    val q = EventStreams.rateLimit(source.toDS(), burst = 2, refillMillis = 1000)
      .writeStream.format("memory").queryName("srate_out")
      .option("checkpointLocation", s"$tmp/cp")
      .outputMode("append")
      .start()
    try {
      // batch 1: burst of 3 inside one refill window (3rd denied), then a
      // refill admits the 4th; another domain has its own bucket
      source.addData(
        row("https://d.example/u1", 0), row("https://d.example/u2", 100),
        row("https://d.example/u3", 200), row("https://d.example/u4", 1200),
        row("https://e.example/v1", 0))
      q.processAllAvailable()
      val b1 = spark.table("srate_out").as[EventStreams.FetchDecision].collect()
        .map(d => d.url -> d.admitted).toMap
      assert(b1 == Map(
        "https://d.example/u1" -> true, "https://d.example/u2" -> true,
        "https://d.example/u3" -> false, "https://d.example/u4" -> true,
        "https://e.example/v1" -> true))
      // batch 2: state carries over — bucket still empty at 1500, two
      // tokens back by 3100
      source.addData(row("https://d.example/u5", 1500), row("https://d.example/u6", 3100))
      q.processAllAvailable()
      val b2 = spark.table("srate_out").as[EventStreams.FetchDecision].collect()
        .filter(_.ts.getTime >= 1500).map(d => (d.url, d.admitted, d.tokens_after))
        .sortBy(_._1).toVector
      assert(b2 == Vector(
        ("https://d.example/u5", false, 0L),
        ("https://d.example/u6", true, 1L)))
    } finally q.stop()
  }
}
