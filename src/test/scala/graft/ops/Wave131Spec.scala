package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture
import org.apache.spark.sql.functions._

/** Wave 131: Good–Turing/Chao1 novelty forecast and Croston smoothing. */
class Wave131Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  test("noveltyForecast: hand spectrum — singletons drive unseen mass") {
    import spark.implicits._
    // clusters: 3 singletons, 1 pair, 1 triple → n=8, d=5, f1=3, f2=1
    val docs = Seq("a", "b", "c", "d", "d", "e", "e", "e")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val r = Dedup.noveltyForecast(docs).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((8L, 5L, 3L, 1L)))
    assert(r.getLong(4) == 375L)              // 3·1000 div 8
    assert(r.getLong(5) == 5L + (3L * 2L) / 4L) // 5 + 6 div 4 = 6
  }

  test("noveltyForecast: all-duplicates corpus has zero unseen mass") {
    import spark.implicits._
    val docs = (0L until 6L).map(i => (i, "same text")).toDF("doc_id", "text")
    val r = Dedup.noveltyForecast(docs).collect().head
    assert(r.getLong(4) == 0L && r.getLong(5) == 1L)
  }

  private def ev(rows: (String, Double)*) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((d, v), i) =>
      (i.toLong, s"$d 12:00:00", 1L, "purchase", v)
    }.toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
  }

  test("crostonForecast: hand fold — size and interval smooth separately") {
    val events = ev(
      ("2024-01-01", 10.0),   // cents 1000, gap 1 (first)
      ("2024-01-04", 20.0),   // cents 2000, gap 3
      ("2024-01-05", 10.0))   // cents 1000, gap 1
    val out = Relational.crostonForecast(events).orderBy("day").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    // day1: z=1000·1000, p=1000; rate = 1e6·1000/1000 = 1e6 milli
    assert(out(0) == ((1000L, 1L, 1000000L, 1000L, 1000000L)))
    // day2: z=(200·2e6+800·1e6)/1000=1200000; p=(200·3000+800·1000)/1000=1400
    assert(out(1) == ((2000L, 3L, 1200000L, 1400L, 857142L)))
    // day3: z=(200·1e6+800·1.2e6)/1000=1160000; p=(200·1000+800·1400)/1000=1320
    assert(out(2) == ((1000L, 1L, 1160000L, 1320L, 878787L)))
  }

  test("crostonForecast: zero-value days never enter the fold") {
    val events = ev(("2024-01-01", 5.0), ("2024-01-02", 0.0),
      ("2024-01-09", 5.0))
    val out = Relational.crostonForecast(events).orderBy("day").collect()
    assert(out.length == 2)
    assert(out(1).getLong(2) == 8L)  // gap skips the zero day: 9−1
  }
}
