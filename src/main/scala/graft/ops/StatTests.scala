package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distribution tests for corpus monitoring — the "did the new crawl
  * change the data" gates that run before a training mix ships. Everything
  * is integer/rational arithmetic on count tables: the corpus contributes
  * one pass, the test statistic lives on the (distinct-value-sized)
  * merged table. */
object StatTests {

  /** Exact two-sample Kolmogorov–Smirnov test between the token-count
    * distributions of two sources. The ECDF gap is kept rational:
    * D = D_num/(n·m) with D_num = max |cumA·m − cumB·n| over the merged
    * value grid, so no floats ever appear; the α=0.05 decision compares
    * D_num² > c²·n·m·(n+m) with c² carried in micro (1.358² = 1.844164)
    * in DECIMAL(38,0) — exact for strata up to ~10^6 docs per side
    * (D_num² ≤ (nm)² needs 38 digits at 10^6·10^6; point the test at
    * eval strata, not the raw corpus, which is also what a KS test means
    * at 10^12 rows: with that n it rejects on noise).
    *
    * Shape: one corpus pass → per-(sample, value) counts; cumulative
    * sums via a window over the value-level (not row-level) table; one
    * max aggregate. */
  def ksTest(docs: DataFrame, sourceA: String, sourceB: String): DataFrame = {
    val tok = TextStats.tokenCountCol(col("text"))
    val counted = docs
      .where(col("source").isin(sourceA, sourceB))
      .select(when(col("source") === sourceA, lit("a")).otherwise(lit("b"))
        .as("side"), tok.as("v"))
      .groupBy("side", "v").agg(count(lit(1)).as("c"))
    val grid = counted.groupBy("v").agg(
      sum(when(col("side") === "a", col("c")).otherwise(0L)).as("ca"),
      sum(when(col("side") === "b", col("c")).otherwise(0L)).as("cb"))
    val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    val tot = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    grid
      .withColumn("cum_a", sum(col("ca")).over(w))
      .withColumn("cum_b", sum(col("cb")).over(w))
      .withColumn("n", sum(col("ca")).over(tot))
      .withColumn("m", sum(col("cb")).over(tot))
      .withColumn("gap", abs(col("cum_a") * col("m") -
        col("cum_b") * col("n")))
      .agg(max(col("n")).as("n_a"), max(col("m")).as("n_b"),
        max(col("gap")).as("d_num"))
      .select(col("n_a"), col("n_b"), col("d_num"),
        expr("d_num * 1000 div (n_a * n_b)").as("d_pm"),
        expr("""CAST(d_num AS DECIMAL(38,0)) * CAST(d_num AS DECIMAL(38,0))
               |  * 1000000 >
               |CAST(1844164 AS DECIMAL(38,0)) * CAST(n_a AS DECIMAL(38,0))
               |  * CAST(n_b AS DECIMAL(38,0))
               |  * (CAST(n_a AS DECIMAL(38,0)) + CAST(n_b AS DECIMAL(38,0)))"""
          .stripMargin).as("reject_05"))
  }

  /** Exact per-source token-count quantiles (p25/p50/p75/p95) via rank
    * selection — the value at rank ⌈q·n⌉ under the deterministic
    * (value, doc_id) order. The approximate-sketch twin lives in
    * `sketch_quantile`; this is the exact gate for source-mix length
    * normalization. One Exchange on source shared by the rank window and
    * the rollup. */
  def sourceLengthQuantiles(docs: DataFrame): DataFrame = {
    val tok = TextStats.tokenCountCol(col("text"))
    val w = Window.partitionBy("source").orderBy(col("v").asc,
      col("doc_id").asc)
    val ranked = docs.select(col("source"), col("doc_id"), tok.as("v"))
      .withColumn("r", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy("source")))
    def at(q: Int) = sum(when(col("r") === expr(s"(n * $q + 99) div 100"),
      col("v"))).as(s"p$q")
    ranked.groupBy("source")
      .agg(max(col("n")).as("n_docs"), at(25), at(50), at(75), at(95))
      .select(col("source"), col("n_docs"), col("p25"), col("p50"),
        col("p75"), col("p95"))
  }

  /** Split-conformal prediction interval for the token count: the
    * calibration half (even doc_ids) yields the finite-sample-adjusted
    * empirical quantile ranks ⌈(n+1)·α/2⌉ and ⌈(n+1)·(1−α/2)⌉, and the
    * held-out half measures realized coverage. For exchangeable rows the
    * interval is guaranteed ≥ 1−α coverage WITHOUT distributional
    * assumptions — the honest "what lengths are normal" band a pipeline
    * alerts on. All rank selection and integer permille (α in permille);
    * one pass per half, the bounds broadcast to the test side. */
  def conformalBounds(docs: DataFrame, alphaPm: Long = 100L): DataFrame = {
    val tok = TextStats.tokenCountCol(col("text"))
    val vals = docs.select(col("doc_id"), tok.as("v"))
    val half = alphaPm / 2
    val ranked = vals.where(col("doc_id") % 2 === 0)
      .withColumn("r", row_number().over(
        Window.orderBy(col("v").asc, col("doc_id").asc)))
      .withColumn("n", count(lit(1)).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    val bounds = ranked.agg(
      max(col("n")).as("n_cal"),
      sum(when(col("r") ===
        expr(s"greatest(1, ((n + 1) * $half) div 1000)"), col("v")))
        .as("lo"),
      sum(when(col("r") ===
        expr(s"least(n, ((n + 1) * ${1000 - half} + 999) div 1000)"),
        col("v"))).as("hi"))
    vals.where(col("doc_id") % 2 =!= 0)
      .crossJoin(broadcast(bounds))
      .agg(max(col("n_cal")).as("n_cal"), count(lit(1)).as("n_test"),
        max(col("lo")).as("lo"), max(col("hi")).as("hi"),
        sum(when(col("v").between(col("lo"), col("hi")), 1L)
          .otherwise(0L)).as("n_covered"))
      .select(col("n_cal"), col("n_test"), col("lo"), col("hi"),
        expr("n_covered * 1000 div greatest(n_test, 1)")
          .as("coverage_pm"))
  }
}
