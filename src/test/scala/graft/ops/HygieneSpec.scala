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
}
