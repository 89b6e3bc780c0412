package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 96: difference-in-differences, sample-ratio-mismatch guard,
  * deterministic training-order shuffle. */
class Wave96Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("diffInDiff: hand numbers — treated change minus control change") {
    import spark.implicits._
    // mid = 50; user 0 (control): pre 1.00 post 2.00; user 1 (treatment):
    // pre 2.00 post 5.00 → delta_c = 100000 m, delta_t = 300000 m,
    // did = 200000 m
    val events = Seq(
      (ts(0L), 0L, "purchase", 1.00), (ts(100L), 0L, "purchase", 2.00),
      (ts(0L), 1L, "purchase", 2.00), (ts(100L), 1L, "purchase", 5.00))
      .toDF("ts", "user_id", "event_type", "value")
    val r = Relational.diffInDiff(events).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getAs[Long]("n_c") == 1L && row.getAs[Long]("n_t") == 1L)
    assert(row.getAs[Long]("mean_pre_c_m") == 100000L)
    assert(row.getAs[Long]("mean_post_c_m") == 200000L)
    assert(row.getAs[Long]("mean_pre_t_m") == 200000L)
    assert(row.getAs[Long]("mean_post_t_m") == 500000L)
    assert(row.getAs[Long]("delta_c_m") == 100000L)
    assert(row.getAs[Long]("delta_t_m") == 300000L)
    assert(row.getAs[Long]("did_m") == 200000L)
  }

  test("diffInDiff: parallel trends cancel — equal changes give did 0") {
    import spark.implicits._
    val events = Seq(
      (ts(0L), 0L, "view", 1.00), (ts(100L), 0L, "view", 4.00),
      (ts(0L), 1L, "view", 7.00), (ts(100L), 1L, "view", 10.00))
      .toDF("ts", "user_id", "event_type", "value")
    val row = Relational.diffInDiff(events).collect()(0)
    assert(row.getAs[Long]("delta_c_m") == 300000L)
    assert(row.getAs[Long]("delta_t_m") == 300000L)
    assert(row.getAs[Long]("did_m") == 0L)
  }

  test("srmCheck: balanced type passes, one-sided type flags") {
    import spark.implicits._
    // 'view': users 0..9 → 5 even / 5 odd → chi2 0, no flag.
    // 'click': users 0,2,4,6 (even only) → chi2 = 16e6/4 = 4,000,000 >
    // 3,841,459 → flag. Repeated events must not inflate distinct counts.
    val view = (0L to 9L).flatMap(u => Seq((ts(u), u, "view", 1.0)))
    val click = Seq(0L, 2L, 4L, 6L, 0L, 2L).map(u => (ts(u), u, "click", 1.0))
    val events = (view ++ click).toDF("ts", "user_id", "event_type", "value")
    val out = Relational.srmCheck(events).orderBy("event_type").collect()
    val byType = out.map(r => r.getString(0) ->
      (r.getAs[Long]("n_even"), r.getAs[Long]("n_odd"),
        r.getAs[Long]("chi2_micro"), r.getAs[Long]("srm_flag"))).toMap
    assert(byType("view") == (5L, 5L, 0L, 0L))
    assert(byType("click") == (4L, 0L, 4000000L, 1L))
  }

  test("corpusShuffle: shard is the first md5 nibble; pos is a 1..n permutation per shard") {
    import spark.implicits._
    val n = 64
    val docs = (0L until n.toLong).toDF("doc_id")
    val out = Sampling.corpusShuffle(docs).collect()
    assert(out.length == n)
    val hexAlphabet = "0123456789abcdef"
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val k = Dedup.md5Hex(s"shuf1:$id")
      assert(r.getAs[Long]("shard") == hexAlphabet.indexOf(k.charAt(0)).toLong)
    }
    out.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("pos")).sorted.toSeq ==
        (1L to rows.length.toLong))
    }
    // in-shard order follows the md5 key order
    val byShard = out.groupBy(_.getAs[Long]("shard"))
    byShard.foreach { case (_, rows) =>
      val sortedByPos = rows.sortBy(_.getAs[Long]("pos"))
        .map(r => Dedup.md5Hex(s"shuf1:${r.getAs[Long]("doc_id")}"))
      assert(sortedByPos.toSeq == sortedByPos.sorted.toSeq)
    }
  }

  test("corpusShuffle: hexDigits=2 spreads over 256 shards with prefix-consistent assignment") {
    import spark.implicits._
    val docs = (0L until 200L).toDF("doc_id")
    val out = Sampling.corpusShuffle(docs, hexDigits = 2).collect()
    val hexAlphabet = "0123456789abcdef"
    out.foreach { r =>
      val k = Dedup.md5Hex(s"shuf1:${r.getAs[Long]("doc_id")}")
      val expect = hexAlphabet.indexOf(k.charAt(0)).toLong * 16L +
        hexAlphabet.indexOf(k.charAt(1)).toLong
      assert(r.getAs[Long]("shard") == expect)
    }
  }
}
