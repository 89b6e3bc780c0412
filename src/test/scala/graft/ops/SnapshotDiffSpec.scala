package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture
import org.apache.spark.sql.functions._

/** Crawl snapshot diff: added/removed/changed/unchanged classification
  * and the per-domain rollup. */
class SnapshotDiffSpec extends AnyFunSuite {

  lazy val spark = SparkSessionFixture.spark

  def docs(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"text of document $i")).toDF("doc_id", "text")
  }

  test("synth snapshots classify by construction: 50 removed, 50 added, overlap%7 changed") {
    import spark.implicits._
    val (a, b) = SnapshotDiff.synthSnapshots(docs(200))
    val out = SnapshotDiff.diff(a, b).as[(String, String)].collect().toMap
    assert(out.size == 200)
    val byStatus = out.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(byStatus("removed") == 50) // ids 0..49
    assert(byStatus("added") == 50)   // ids 150..199
    // overlap 50..149: multiples of 7 → 56,63,...,147 = 14 ids
    assert(byStatus("changed") == 14)
    assert(byStatus("unchanged") == 86)
    assert(out("https://site0.example/a/p56") == "changed")
    assert(out("https://site1.example/a/p57") == "unchanged")
  }

  test("domain rollup is algebraic over the diff") {
    // n must exceed 100 for the two 50-wide snapshot offsets to overlap
    val (a, b) = SnapshotDiff.synthSnapshots(docs(120))
    val roll = SnapshotDiff.domainSummary(SnapshotDiff.diff(a, b))
    assert(roll.agg(sum("n")).head().getLong(0) == 120L)
    assert(roll.select("domain").distinct().count() == 8)
  }

  test("hash equality drives changed vs unchanged, not id arithmetic") {
    import spark.implicits._
    val a = Seq(("u1", "h1"), ("u2", "h2")).toDF("url", "content_md5")
    val b = Seq(("u1", "h1"), ("u2", "hX"), ("u3", "h3")).toDF("url", "content_md5")
    val out = SnapshotDiff.diff(a, b).as[(String, String)].collect().toMap
    assert(out == Map("u1" -> "unchanged", "u2" -> "changed", "u3" -> "added"))
  }
}
