package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSessionFixture

/** Script routing, keeper selection, vector hygiene, compaction planning. */
class HygieneSpec extends AnyFunSuite {

  lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  test("script profile: dominant script flips with planted runs") {
    val docs = Seq(
      (1L, "hello plain text"),
      (2L, "короткий текст на русском языке для теста"),
      (3L, "这是一个中文文本样本这是一个中文文本样本")).toDF("doc_id", "text")
    val m = Hygiene.scriptProfile(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("dominant")).toMap
    assert(m == Map(1L -> "latin", 2L -> "cyrillic", 3L -> "cjk"))
  }

  test("keeper policy: longest copy wins, ties break to smallest id") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (9L, 7L))
      .toDF("doc_id", "cluster_id")
    val meta = Seq((1L, 50L), (2L, 80L), (3L, 80L), (7L, 10L), (9L, 10L))
      .toDF("doc_id", "n_chars")
    val out = Hygiene.keeperPolicy(clusters, meta).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("keeper_id"), r.getAs[Boolean]("is_keeper"))).toMap
    assert(out(2L) == ((2L, true)), "longest (80) with smallest id among ties")
    assert(out(3L) == ((2L, false)))
    assert(out(1L) == ((2L, false)))
    assert(out(7L) == ((7L, true)) && out(9L) == ((7L, false)))
  }

  test("embedding hygiene: nan, zero, out-of-range planted rows all flagged") {
    val good = (0 until 10).map(i =>
      (i.toLong, Seq.tabulate(8)(t => 0.3f + 0.01f * ((i + t) % 5))))
    val rows = good ++ Seq(
      (100L, Seq.fill(8)(Float.NaN)),
      (101L, Seq.fill(8)(0f)),
      (102L, Seq.fill(8)(9999f)))
    val df = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val r = Hygiene.embeddingHygiene(df).collect().head
    assert(r.getAs[Long]("n_vectors") == 13L)
    assert(r.getAs[Long]("n_nan") == 1L)
    assert(r.getAs[Long]("n_zero") == 1L)
    assert(r.getAs[Long]("n_out_of_range") == 1L)
  }

  test("compaction plan: groups respect target, files stay consecutive, totals add up") {
    val files = (0 until 20).map(i => ("p0", i.toLong, 300L)).toDF("part", "file_id", "bytes")
    val out = Hygiene.compactionPlan(files, targetBytes = 1000L).collect()
      .sortBy(r => r.getAs[Long]("grp"))
    // 300B files, 1000B target: group = floor(start offset / target), so
    // a group holds every file STARTING inside its window — 4,3,3 cycles
    // (the first group absorbs offsets 0,300,600,900)
    assert(out.map(_.getAs[Long]("n_files")).toSeq == Seq(4L, 3L, 3L, 4L, 3L, 3L))
    assert(out.map(_.getAs[Long]("group_bytes")).sum == 6000L)
    // consecutive: each group's span is exactly its file count
    out.foreach { r =>
      assert(r.getAs[Long]("last_file") - r.getAs[Long]("first_file") + 1 ==
        r.getAs[Long]("n_files"))
    }
  }

  test("mojibakeRepair: fixes UTF-8-as-Latin-1, leaves genuine text alone") {
    val docs = Seq(
      (1L, "plain ascii text"),
      (2L, "caf\u00c3\u00a9 and na\u00c3\u00afve mojibake"),   // -> café, naïve
      (3L, "genuine \u00c3 alone stays"),                      // C3+space: invalid UTF-8
      (4L, "\u4e2d\u6587 beyond latin1 untouched \u00c3\u00a9")  // not latin1-encodable
    ).toDF("doc_id", "text")
    val out = Hygiene.mojibakeRepair(docs)
      .as[(Long, Long, Boolean, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 0 && !out(1L)._3)
    assert(out(1L)._5 == graft.ops.Dedup.md5Hex("plain ascii text"))
    assert(out(2L)._2 == 2 && out(2L)._3)
    assert(out(2L)._5 == graft.ops.Dedup.md5Hex("caf\u00e9 and na\u00efve mojibake"))
    assert(out(2L)._4 == "caf\u00e9 and na\u00efve mojibake".length.toLong)
    // strict decoder rejects C3+ASCII -> no repair
    assert(out(3L)._2 == 1 && !out(3L)._3)
    assert(out(3L)._5 == graft.ops.Dedup.md5Hex("genuine \u00c3 alone stays"))
    // CJK chars make the text non-latin1-encodable -> no repair attempted
    assert(out(4L)._2 == 1 && !out(4L)._3)
  }
}
