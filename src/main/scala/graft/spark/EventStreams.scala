package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured-Streaming operators over the `events` stream table:
  * watermarked tumbling-window aggregation and stateful sessionization via
  * flatMapGroupsWithState (SURVEY.md §2.10's optional streaming carrier,
  * exercised on the driver's events data). Both run with
  * Trigger.AvailableNow over a file source, the batch-resume-friendly mode. */
object EventStreams {

  final case class EventRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                            event_type: String, value: Double)
  final case class Session(user_id: Long, n_events: Long, first_ts: java.sql.Timestamp,
                           last_ts: java.sql.Timestamp, total_value: Double)

  /** Streaming exact dedup over a document stream: first-seen rows pass,
    * later duplicates (by content hash) drop — the ingest-time companion
    * to the batch [[graft.ops.Dedup.exact]]. Emits (h, url, first_seen)
    * for each NEW hash per micro-batch via mapGroupsWithState.
    *
    * State TTL: pass `ttl = Some("24 hours")` to age seen-hashes out via
    * processing-time timeouts (a crawl re-fetches the same bytes for days;
    * unbounded state grows with the corpus at 10^12 rows). With a TTL the
    * engine schedules timeout-check batches on its own clock, so drain-
    * style tests (`processAllAvailable`) should use `ttl = None`. */
  final case class SeenDoc(h: String, url: String, first_seen: java.sql.Timestamp)
  def streamingExactDedup(docs: Dataset[PageRow],
                          ttl: Option[String] = None): Dataset[SeenDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val timeoutKind =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    docs
      .select(col("url"), col("warc_ts"), md5(col("html")).as("h"))
      .as[(String, java.sql.Timestamp, String)]
      .groupByKey(_._3)
      .mapGroupsWithState[Long, Option[SeenDoc]](timeoutKind) {
        case (h, rows, state) =>
          if (state.hasTimedOut) { state.remove(); None }
          else if (state.exists) { ttl.foreach(state.setTimeoutDuration); None } // duplicate
          else {
            state.update(1L)
            ttl.foreach(state.setTimeoutDuration)
            val first = rows.minBy(_._2.getTime)
            Some(SeenDoc(h, first._1, first._2))
          }
      }
      .flatMap(_.iterator)
  }

  final case class FetchDecision(domain: String, url: String,
      ts: java.sql.Timestamp, admitted: Boolean, tokens_after: Long)

  /** Streaming per-domain token-bucket rate limiter — politeness
    * ENFORCEMENT at ingest time (the planning side is `fetch_plan`):
    * each domain's bucket holds up to `burst` tokens and refills one per
    * `refillMillis` of EVENT time; a fetch is admitted iff a token is
    * available. State per domain is two longs (token count + last refill
    * stamp) — bounded by |domains|, the politeness envelope itself.
    * In-batch fetches apply in event-time order, so micro-batch
    * boundaries never change decisions: the trace is deterministic for a
    * given input timeline, which is what the spec pins. */
  def rateLimit(fetches: Dataset[PageRow], burst: Long = 2,
                refillMillis: Long = 1000): Dataset[FetchDecision] = {
    val spark = fetches.sparkSession
    import spark.implicits._
    fetches
      .select(regexp_extract(col("url"), "^https?://([^/]+)/", 1).as("domain"),
        col("url"), col("warc_ts"))
      .as[(String, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), FetchDecision](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (domain, rows, state) =>
          var (tokens, last) = state.getOption.getOrElse((burst, Long.MinValue))
          val out = rows.toVector.sortBy(r => (r._3.getTime, r._2)).map { case (_, url, ts) =>
            val t = ts.getTime
            if (last == Long.MinValue) last = t
            else if (t > last) {
              val refill = (t - last) / refillMillis
              if (refill > 0) { tokens = math.min(burst, tokens + refill); last += refill * refillMillis }
            }
            val admitted = tokens > 0
            if (admitted) tokens -= 1
            FetchDecision(domain, url, ts, admitted, tokens)
          }
          state.update((tokens, last))
          out.iterator
      }
  }

  /** Streaming change feed — the ingest-time companion to the batch
    * [[graft.ops.SnapshotDiff.diff]]: each refetch of a url classifies
    * against the last content hash seen for that url — `new` (first
    * sighting), `changed` (hash moved), `unchanged` (same bytes again).
    * Drives recrawl scheduling without waiting for a snapshot boundary.
    *
    * State per url is ONE md5 string (bounded by |distinct urls|, the
    * same envelope as the batch diff's join key set); in-batch refetches
    * of a url apply in warc_ts order so multi-fetch micro-batches
    * classify deterministically. For crawls where urls age out, wire a
    * processing-time TTL exactly as streamingExactDedup does. */
  final case class FetchStatus(url: String, ts: java.sql.Timestamp, status: String)
  def streamingChangeFeed(fetches: Dataset[PageRow]): Dataset[FetchStatus] = {
    val spark = fetches.sparkSession
    import spark.implicits._
    fetches.groupByKey(_.url)
      .flatMapGroupsWithState[String, FetchStatus](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (url, rows, state: GroupState[String]) =>
          val md = java.security.MessageDigest.getInstance("MD5")
          def hashOf(b: Array[Byte]): String = {
            md.reset()
            md.digest(if (b == null) Array.emptyByteArray else b)
              .map(x => f"$x%02x").mkString
          }
          var last = state.getOption.orNull
          val out = rows.toVector.sortBy(_.warc_ts.getTime).map { p =>
            val h = hashOf(p.html)
            val status =
              if (last == null) "new" else if (h == last) "unchanged" else "changed"
            last = h
            FetchStatus(url, p.warc_ts, status)
          }
          if (last != null) state.update(last)
          out.iterator
      }
  }

  /** Tumbling 1-hour windows per event type with a 2-hour watermark. */
  def windowedCounts(spark: SparkSession, eventsDir: String, outDir: String,
                     checkpointDir: String): Unit = {
    val schema = spark.read.parquet(eventsDir).schema
    val stream = spark.readStream.schema(schema).parquet(eventsDir)
      .withColumn("ts", col("ts").cast("timestamp")) // NTZ → instant for event time
    val agg = stream
      .withWatermark("ts", "2 hours")
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_v"))
      .select(col("event_type"), col("window.start").as("w_start"), col("cnt"), col("sum_v"))
    val q = agg.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** [[windowedCounts]] variant that RETURNS the watermark-drop count —
    * the late-data audit a streaming pipeline publishes (how many events
    * arrived too late to count?). Designed for resumed runs over one
    * checkpoint: the watermark persists, so a second invocation after new
    * files land drops events older than (max event time − 2 h) and reports
    * them instead of silently double-counting or mutating closed windows.
    * At scale this is THE correctness/observability contract of windowed
    * streaming aggregation. */
  def windowedCountsAudited(spark: SparkSession, eventsDir: String, outDir: String,
                            checkpointDir: String): Long = {
    val schema = spark.read.parquet(eventsDir).schema
    val stream = spark.readStream.schema(schema).parquet(eventsDir)
      .withColumn("ts", col("ts").cast("timestamp"))
    val agg = stream
      .withWatermark("ts", "2 hours")
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("event_type"), col("window.start").as("w_start"), col("cnt"))
    val q = agg.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.recentProgress.iterator
      .flatMap(p => Option(p.stateOperators).iterator.flatten)
      .map(_.numRowsDroppedByWatermark).sum
  }

  /** Stream-STREAM interval join: purchases matched to clicks by the same
    * user within `windowMinutes` — in-flight conversion attribution. Both
    * sides carry event-time watermarks, so the join state is BOUNDED: a
    * buffered click can be dropped once the purchase watermark passes
    * click_ts + window (Spark derives the state-cleanup predicate from the
    * interval condition — this is the canonical watermark + range-condition
    * shape). Batch twin: [[graft.ops.Relational.conversionWindow]], which
    * the spec compares row-for-row. */
  def conversionWindowStream(spark: SparkSession, eventsDir: String, outDir: String,
                             checkpointDir: String, windowMinutes: Int = 10): Unit = {
    val schema = spark.read.parquet(eventsDir).schema
    val stream = spark.readStream.schema(schema).parquet(eventsDir)
      .withColumn("ts", col("ts").cast("timestamp"))
    val clicks = stream.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = stream.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    val joined = clicks.join(purchases, expr(
        s"""c_user = p_user AND purchase_ts > click_ts
           |AND purchase_ts <= click_ts + INTERVAL $windowMinutes MINUTES""".stripMargin
          .replace("\n", " ")))
      .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"),
        (unix_timestamp(col("purchase_ts")) - unix_timestamp(col("click_ts")))
          .as("lag_sec"))
    val q = joined.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Per-user sessionization: events within 30 minutes of each other belong
    * to one session (flatMapGroupsWithState with processing-time timeout —
    * AvailableNow flushes state at stream end). */
  def sessionize(spark: SparkSession, eventsDir: String, outDir: String,
                 checkpointDir: String): Unit = {
    import spark.implicits._
    val schema = spark.read.parquet(eventsDir).schema
    val stream = spark.readStream.schema(schema).parquet(eventsDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventRow]
    val sessions = stream
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Vector[EventRow], Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[Vector[EventRow]]) =>
          val all = (state.getOption.getOrElse(Vector.empty) ++ rows).sortBy(_.ts.getTime)
          // split into 30-minute-gap sessions; emit all but keep none (the
          // AvailableNow batch sees the full file set, so state is final)
          val gapMs = 30L * 60 * 1000
          val sessions = Vector.newBuilder[Session]
          var cur = Vector.empty[EventRow]
          all.foreach { e =>
            if (cur.nonEmpty && e.ts.getTime - cur.last.ts.getTime > gapMs) {
              sessions += toSession(userId, cur)
              cur = Vector(e)
            } else cur :+= e
          }
          if (cur.nonEmpty) sessions += toSession(userId, cur)
          state.remove()
          sessions.result().iterator
      }
    val q = sessions.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private def toSession(userId: Long, events: Vector[EventRow]): Session =
    Session(userId, events.length.toLong, events.head.ts, events.last.ts,
      events.map(_.value).sum)

  /** Batch equivalents for verification (same semantics, plain DataFrame). */
  def windowedCountsBatch(spark: SparkSession, eventsDir: String): DataFrame =
    spark.read.parquet(eventsDir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_v"))
      .select(col("event_type"), col("window.start").as("w_start"), col("cnt"), col("sum_v"))

  def sessionizeBatch(spark: SparkSession, eventsDir: String): Dataset[Session] = {
    import spark.implicits._
    spark.read.parquet(eventsDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventRow]
      .groupByKey(_.user_id)
      .flatMapGroups { (userId: Long, rows: Iterator[EventRow]) =>
        val all = rows.toVector.sortBy(_.ts.getTime)
        val gapMs = 30L * 60 * 1000
        val sessions = Vector.newBuilder[Session]
        var cur = Vector.empty[EventRow]
        all.foreach { e =>
          if (cur.nonEmpty && e.ts.getTime - cur.last.ts.getTime > gapMs) {
            sessions += toSession(userId, cur)
            cur = Vector(e)
          } else cur :+= e
        }
        if (cur.nonEmpty) sessions += toSession(userId, cur)
        sessions.result().iterator
      }
  }
}
