package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 121: exact Shapley drop attribution and word burstiness. */
class Wave121Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  test("gateShapley: single-gate corpus gives that gate everything") {
    import spark.implicits._
    val long = ("tok " * 50).trim
    // 4 docs, all contain 'query', ' the ', ' a ' twice, ≥40 tokens —
    // except two docs that are short (gate 1 only)
    val base = s"$long the a thing a query"
    val docs = Seq(base, base, "tiny query the a thing a doc",
      "small query the a word a here").toDF("text")
    val out = PipelinePlan.gateShapley(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(4))).toMap
    // v(N)=2 (the two short docs) → total 24 twelfths, all on g1
    assert(out("g1_short") == ((24L, 1000L)))
    assert(out("g2_stopword")._1 == 0L)
    assert(out("g3_article")._1 == 0L)
    assert(out("g4_scan")._1 == 0L)
  }

  test("gateShapley: overlapping gates split credit equally; efficiency axiom") {
    import spark.implicits._
    val long = ("tok " * 50).trim
    // one doc rejected by BOTH g1 (short) and g2 (no ' the ') and
    // nothing else; one clean doc
    val docs = Seq(
      "brief a words a query",                    // short + no ' the '
      s"$long the a thing a query").toDF("text")
    val rows = PipelinePlan.gateShapley(docs).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    val phi = rows.map(r => r._1 -> r._2).toMap
    // symmetric overlap: 6 twelfths each (φ = 1/2 doc each)
    assert(phi("g1_short") == 6L && phi("g2_stopword") == 6L)
    assert(phi("g3_article") == 0L && phi("g4_scan") == 0L)
    // efficiency: Σφ = 12·v(N) = 12·1
    assert(rows.head._3 == 12L)
    assert(rows.map(_._2).sum == 12L)
  }

  test("gateShapley on real docs: efficiency axiom and non-negativity") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").select("text")
    val rows = PipelinePlan.gateShapley(docs).collect()
      .map(r => (r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).sum == rows.head._2)   // Σφ = total
    assert(rows.forall(_._1 >= 0L))              // monotone game
  }

  test("burstiness: hand corpus — bursty vs uniform word") {
    import spark.implicits._
    // 4 docs; 'u' once per doc (uniform), 'b' four times in one doc
    val docs = Seq(
      (0L, "u b b b b"), (1L, "u"), (2L, "u"), (3L, "u"))
      .toDF("doc_id", "text")
    val out = TextStats.burstiness(docs, k = 5).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // u: df 4, T 4, Σx² 4 → vmr = 1000·(4·4−16)/(4·4) = 0 (no variance)
    assert(out("u") == ((4L, 4L, 4L, 0L)))
    // b: df 1, T 4, Σx² 16 → vmr = 1000·(4·16−16)/(4·4) = 3000
    assert(out("b") == ((1L, 4L, 16L, 3000L)))
  }

  test("burstiness: poisson-ish scattered word sits near 1000 milli") {
    import spark.implicits._
    // 10 docs, word 'p' with counts 0,1,2 repeating — mean .9, near-Poisson
    val docs = (0L until 10L).map(i =>
      (i, Seq.fill((i % 3).toInt)("p").mkString(" ") + " filler"))
      .toDF("doc_id", "text")
    val out = TextStats.burstiness(docs, k = 5).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    // counts: 0,1,2,0,1,2,... T=9, Σx²=15 → vmr=1000·(10·15−81)/(10·9)=766
    assert(out("p") == 766L)
  }
}
