package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSessionFixture
import graft.spark.EventStreams

/** Wave 67: dedup bias audit, assortativity moments, watermark drop audit. */
class Wave67Spec extends AnyFunSuite {

  lazy val spark = SparkSessionFixture.spark

  test("assortativity: star graph is maximally disassortative, clique balanced") {
    import spark.implicits._
    // star: center 0 degree 5, leaves degree 1 → cov_num < 0
    val star = (1L to 5L).map(i => (0L, i)).toDF("src", "dst")
    val s = Graph.assortativity(star).collect()(0)
    assert(s.getLong(0) == 10L)     // m = 2×5 directed pair rows
    assert(s.getLong(4) < 0L, s"star cov_num should be negative: $s")
    // clique K4: all degrees equal → zero covariance AND zero variance
    val k4 = (for { a <- 0L to 3L; b <- 0L to 3L if a < b } yield (a, b)).toDF("src", "dst")
    val c = Graph.assortativity(k4).collect()(0)
    assert(c.getLong(4) == 0L && c.getLong(5) == 0L)
  }

  test("streaming watermark drop audit: resumed run reports late rows") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("late").toString
    val in = s"$tmp/in"; val out = s"$tmp/out"; val cp = s"$tmp/cp"
    def ev(id: Long, h: Int, mi: Int) =
      (id, java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$mi%02d:00"), 1L, "click", 1.0, "{}")
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    // batch 1: events 10:00..14:00 → final watermark = 14:00 − 2 h = 12:00
    Seq(ev(1, 10, 0), ev(2, 11, 30), ev(3, 14, 0)).toDF(cols: _*)
      .write.mode("append").parquet(in)
    val dropped1 = EventStreams.windowedCountsAudited(spark, in, out, cp)
    assert(dropped1 == 0L)
    // batch 2 (same checkpoint): an 08:00 straggler is beyond the carried
    // watermark and must be DROPPED AND COUNTED; 14:30 advances normally
    Seq(ev(4, 8, 0), ev(5, 14, 30)).toDF(cols: _*)
      .write.mode("append").parquet(in)
    val dropped2 = EventStreams.windowedCountsAudited(spark, in, out, cp)
    assert(dropped2 >= 1L, s"late row must be reported, got $dropped2")
    // and the 08:00 window never reaches the output
    val outRows = spark.read.parquet(out)
    assert(outRows.where(col("w_start") ===
      java.sql.Timestamp.valueOf("2024-01-01 08:00:00")).count() == 0)
  }
}
