package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture
import org.apache.spark.sql.functions._

/** Wave 127: detector-agreement Venn and water-filling mixture trim. */
class Wave127Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  test("vennPairs: masks partition the union of the three detectors") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = Dedup.corpusWithReplicas(docs)
    val venn = Dedup.vennPairs(corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val mh = Dedup.minhashLsh(corpus).count()
    val sh = Dedup.simhashPairs(corpus).count()
    val jc = Dedup.jaccardBlocked(corpus).count()
    // every detector's pair count must equal the sum of its masks
    def massWithBit(bit: Long) =
      venn.collect { case (m, n) if (m & bit) == bit => n }.sum
    assert(massWithBit(1L) == mh)
    assert(massWithBit(2L) == sh)
    assert(massWithBit(4L) == jc)
    assert(venn.keys.forall(m => m >= 1 && m <= 7))
  }

  test("vennPairs: detector labels match the mask bits") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val rows = Dedup.vennPairs(Dedup.corpusWithReplicas(docs)).collect()
    rows.foreach { r =>
      val mask = r.getLong(0); val label = r.getString(1)
      assert(label.contains("minhash") == ((mask & 1) == 1))
      assert(label.contains("simhash") == ((mask & 2) == 2))
      assert(label.contains("jaccard") == ((mask & 4) == 4))
    }
  }

  private def mkDocs(rows: (String, Int)*) = {
    import spark.implicits._
    rows.toDF("source", "n").selectExpr("source",
      "array_join(transform(sequence(1, n), i -> 'w'), ' ') AS text")
  }

  test("mixtureWaterfill: hand fill point — hot source absorbs the cut") {
    // tokens: a=100, b=300, c=1000; budget 600 → keep a whole (100),
    // j=2: prefix1=100, remaining 2 → cap=(600-100)/2=250 < 300 ✓
    val out = PipelinePlan.mixtureWaterfill(
      mkDocs(("a", 100), ("b", 300), ("c", 1000)), budget = 600L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("a") == ((100L, 250L, 100L)))
    assert(out("b") == ((300L, 250L, 250L)))
    assert(out("c") == ((1000L, 250L, 250L)))
  }

  test("mixtureWaterfill: budget above total → nothing trimmed") {
    val out = PipelinePlan.mixtureWaterfill(
      mkDocs(("a", 50), ("b", 80)), budget = 1000L)
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getLong(5)))
      .toMap
    assert(out("a")._1 == 50L && out("b")._1 == 80L)
    // shares preserved: 50/130 → 384pm, 80/130 → 615pm
    assert(out("a")._2 == 384L && out("b")._2 == 615L)
  }

  test("mixtureWaterfill: kept total never exceeds the budget") {
    val out = PipelinePlan.mixtureWaterfill(
      mkDocs(("a", 7), ("b", 13), ("c", 29), ("d", 101)), budget = 60L)
      .collect()
    assert(out.map(_.getLong(3)).sum <= 60L)
    // small sources under the cap are untouched
    val m = out.map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(m("a") == ((7L, 7L)) && m("b") == ((13L, 13L)))
  }
}
