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
