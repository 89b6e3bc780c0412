package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSessionFixture

/** Wave 75: minhash S-curve eval, drop attribution, gate-agreement kappa. */
class Wave75Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  test("minhashEval: exact dup collides at decile 10, disjoint pair never") {
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val b = "one two three four five six seven eight nine"
    val df = Seq((1L, a), (2L, a), (3L, b)).toDF("doc_id", "text")
    val rows = Dedup.minhashEval(df, k = 16, bands = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // pair (1,2): identical → decile 10, all bands collide
    assert(rows(10L) == (1L, 1L))
    // pairs (1,3),(2,3): zero overlap → decile 0, no collision (16 seeded
    // mins over disjoint gram sets colliding would be an md5 collision)
    assert(rows(0L) == (2L, 0L))
  }

  test("drop attribution: first failing gate wins the cascade") {
    // via the public query shape: a doc that is BOTH a dup and too short
    // must report exact_dup (cascade order), not too_short
    val c = Seq(
      (1L, "tiny text"),                       // too_short (ntok < 50)
      (2L, "tiny text"),                       // dup of 1 AND too short → exact_dup
      (3L, Seq.fill(60)("the word and of").mkString(" "))) // long, en markers
      .toDF("doc_id", "text")
    val keeper = min(col("doc_id")).over(
      org.apache.spark.sql.expressions.Window.partitionBy(md5(col("text"))))
    val nTok = TextStats.tokenCountCol(col("text"))
    val out = c.withColumn("keeper", keeper)
      .select(col("doc_id"),
        when(col("doc_id") =!= col("keeper"), "exact_dup")
          .when(nTok < 50, "too_short")
          .otherwise("kept").as("reason"))
      .orderBy("doc_id").as[(Long, String)].collect()
    assert(out.toSeq == Seq((1L, "too_short"), (2L, "exact_dup"), (3L, "kept")))
  }

  test("integer kappa matches the float formula") {
    def intKappa(n11: Long, n10: Long, n01: Long, n00: Long): Long = {
      val n = n11 + n10 + n01 + n00
      val pe = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
      if (n * n == pe) 1000000L
      else 1000000L * (n * (n11 + n00) - pe) / (n * n - pe)
    }
    def floatKappa(n11: Long, n10: Long, n01: Long, n00: Long): Double = {
      val n = (n11 + n10 + n01 + n00).toDouble
      val po = (n11 + n00) / n
      val pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / (n * n)
      (po - pe) / (1 - pe)
    }
    for ((a, b, c, d) <- Seq((40L, 10L, 5L, 45L), (10L, 20L, 30L, 40L),
        (50L, 0L, 0L, 50L), (25L, 25L, 25L, 25L), (1L, 99L, 99L, 1L))) {
      val i = intKappa(a, b, c, d)
      val f = floatKappa(a, b, c, d)
      assert(math.abs(i / 1e6 - f) < 1e-5, s"($a,$b,$c,$d): int=$i float=$f")
    }
    // degenerate pe == 1 (all mass in one margin cell pair)
    assert(intKappa(100, 0, 0, 0) == 1000000L)
  }
}
