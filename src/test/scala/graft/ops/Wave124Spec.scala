package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture
import org.apache.spark.sql.functions._

/** Wave 124: Aho–Corasick blocklist kernel and IVM merge audit. */
class Wave124Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  test("Automaton: counts every occurrence incl. cross-pattern overlap") {
    val ac = new Blocklist.Automaton(Seq("he", "she", "his", "hers"))
    val c = ac.countAll("ushers")
    // 'ushers': she@1, he@2, hers@2
    assert(c.toSeq == Seq(1L, 1L, 0L, 1L))
  }

  test("Automaton vs naive scan on deterministic pseudo-random text") {
    val pats = Seq("ab", "bc", "cab", "abc")
    val ac = new Blocklist.Automaton(pats)
    val rnd = new scala.util.Random(42)
    (0 until 30).foreach { _ =>
      val s = (0 until 200).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      val got = ac.countAll(s).toSeq
      val want = pats.map(p =>
        s.sliding(p.length).count(_ == p).toLong)
      assert(got == want, s"text=$s")
    }
  }

  test("scan: per-doc profile with dominant-pattern tie broken by list order") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the spark engine does a hash join on the big table stream"),
      (1L, "nothing objectionable here at all"),
      (2L, "stream stream spark")).toDF("doc_id", "text")
    val out = Blocklist.scan(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4)))
    // doc 0: spark 1, hash join 1, big table 1, stream 1 → tie at 1 →
    // first pattern 'spark' wins
    assert(out(0) == ((0L, 4L, 4L, "spark", 1L)))
    // doc 1 emits nothing (hit-sized output)
    assert(out.length == 2)
    assert(out(1) == ((2L, 3L, 2L, "stream", 2L)))
  }

  test("ivmMergeAudit: merged equals full on every group") {
    import spark.implicits._
    val rows = (0L until 100L).map { i =>
      (i, s"2024-01-${(i % 28 + 1).formatted("%02d")} 06:00:00",
        if (i % 2 == 0) "click" else "view", (i * 7 % 500).toDouble / 10)
    }
    val events = rows.toDF("event_id", "ts_s", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = Relational.ivmMergeAudit(events).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getBoolean(7), r.toString)
      assert(r.getLong(1) == r.getLong(2))
      assert(r.getLong(3) == r.getLong(4))
    }
  }

  test("ivmMergeAudit: group present only in delta still merges (full outer)") {
    import spark.implicits._
    val events = Seq(
      (0L, "2024-01-05 00:00:00", "click", 1.0),
      (1L, "2024-01-25 00:00:00", "purchase", 9.0))
      .toDF("event_id", "ts_s", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = Relational.ivmMergeAudit(events).orderBy("event_type")
      .collect()
    assert(out.map(_.getString(0)).toSeq == Seq("click", "purchase"))
    assert(out.forall(_.getBoolean(7)))
  }
}
