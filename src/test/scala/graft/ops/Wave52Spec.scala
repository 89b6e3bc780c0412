package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 52: integer EWMA daily trend, tf-idf keyword terms. */
class Wave52Spec extends AnyFunSuite {

  lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  test("ewma: integer recurrence matches hand-computed trajectory") {
    val ts0 = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
    def at(day: Int, i: Int) =
      new java.sql.Timestamp(ts0.getTime + day * 86400000L + i * 1000L)
    // day volumes: 10, 20, 10
    val rows = (0 until 10).map(i => ("click", at(0, i))) ++
      (0 until 20).map(i => ("click", at(1, i))) ++
      (0 until 10).map(i => ("click", at(2, i)))
    val ev = rows.toDF("event_type", "ts")
    val rs = Relational.ewmaDaily(ev).orderBy("day").collect()
      .map(r => (r.getString(1), r.getAs[Long]("n"), r.getAs[Long]("ewma_m"), r.getAs[Long]("resid_m")))
    // ewma0 = 10000; ewma1 = (300*20000 + 700*10000)/1000 = 13000;
    // ewma2 = (300*10000 + 700*13000)/1000 = 12100
    assert(rs.toSeq == Seq(
      ("2024-03-01", 10L, 10000L, 0L),
      ("2024-03-02", 20L, 13000L, 7000L),
      ("2024-03-03", 10L, 12100L, 2100L)))
  }

  test("ewma: types are independent series") {
    val ts0 = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
    val ev = Seq(("a", ts0), ("b", ts0), ("b", ts0)).toDF("event_type", "ts")
    val rs = Relational.ewmaDaily(ev).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("ewma_m")).toMap
    assert(rs == Map("a" -> 1000L, "b" -> 2000L))
  }

  test("tfidf: planted corpus ranks rare-but-frequent terms first") {
    // 4 docs; 'zebra' only in doc 0 (tf 3) -> idf_m = 4000/1 = 4000, score 12000
    // 'the' in all docs -> idf_m = 1000
    val docs = Seq(
      (0L, "zebra zebra zebra the scan the"),
      (1L, "the scan runs fast today"),
      (2L, "the scan scan scan merge"),
      (3L, "the merge holds steady now")).toDF("doc_id", "text")
    val rs = TextStats.tfidfTerms(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank")) ->
        ((r.getAs[String]("term"), r.getAs[Long]("tf"), r.getAs[Long]("df"), r.getAs[Long]("score")))).toMap
    assert(rs((0L, 1L)) == (("zebra", 3L, 1L, 12000L)))
    // doc 2: scan tf=3 df=3 -> 3*1333=3999 beats the (tf2*1000=2000) and merge (1*2000)
    assert(rs((2L, 1L)) == (("scan", 3L, 3L, 3999L)))
    assert(rs((2L, 2L))._1 == "merge") // merge 1*2000 beats 'the' 1*1000
    // every doc has exactly 3 ranked rows (>=3 distinct terms each)
    assert(rs.keys.count(_._1 == 1L) == 3)
  }

  test("subsample: rare words always keep, frequent words thin, deterministic") {
    // 'hot' dominates (100 of 120 tokens), 'rare' appears twice
    val hotDoc = (0 until 50).map(_ => "hot").mkString(" ")
    val docs = Seq(
      (0L, hotDoc), (1L, hotDoc),
      (2L, "rare cold " + (0 until 18).map(_ => "warm").mkString(" "))).toDF("doc_id", "text")
    val rs = TextStats.subsampleFreq(docs, tPpm = 20000).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term")) ->
        ((r.getAs[Long]("n_occ"), r.getAs[Long]("n_kept")))).toMap
    // f(rare)=1/120 < t=2% -> p = sqrt(t/f) > 1 -> always kept
    assert(rs((2L, "rare")) == ((1L, 1L)))
    assert(rs((2L, "cold")) == ((1L, 1L)))
    // f(hot)=100/120: p = sqrt(0.02/0.833) ~ 0.155 -> most occurrences drop
    val (hOcc, hKept) = rs((0L, "hot"))
    assert(hOcc == 50L && hKept < 20L, s"hot kept $hKept of $hOcc")
    // deterministic under repartition
    val again = TextStats.subsampleFreq(docs.repartition(7), tPpm = 20000).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term")) ->
        ((r.getAs[Long]("n_occ"), r.getAs[Long]("n_kept")))).toMap
    assert(again == rs)
  }

  test("sentences: terminal-punct split, newline flattening, integer stats") {
    val docs = Seq(
      (0L, "the scan runs. the join\nmerges fast! done"),
      (1L, "no terminal punctuation here"),
      (2L, "")).toDF("doc_id", "text")
    val rs = TextStats.sentenceStats(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_sentences"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("max_tokens"), r.getAs[Long]("avg_tokens_x10")))).toMap
    // doc 0: "the scan runs" (3) | "the join merges fast" (4) | "done" (1)
    assert(rs(0L) == ((3L, 8L, 4L, 26L)))
    assert(rs(1L) == ((1L, 4L, 4L, 40L)))
    assert(rs(2L) == ((0L, 0L, 0L, 0L)))
  }

  test("tfidf: ties break by term ascending, identical to the oracle rule") {
    val docs = Seq(
      (0L, "aa bb"), (1L, "aa bb")).toDF("doc_id", "text")
    // both terms: tf 1, df 2, score 1000 -> rank by term asc
    val rs = TextStats.tfidfTerms(docs, k = 2).orderBy("doc_id", "rank").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank"), r.getAs[String]("term")))
    assert(rs.toSeq == Seq((0L, 1L, "aa"), (0L, 2L, "bb"), (1L, 1L, "aa"), (1L, 2L, "bb")))
  }
}
