package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus profiling: EXACT per-stratum quantiles at web scale.
  *
  * The two standard Spark answers both fail the brief here:
  * `percentile_approx` is approximate (not oracle-able), and exact
  * `percentile` buffers every value in the aggregation state — O(corpus)
  * memory on the reducer. For a BOUNDED INTEGER domain (document lengths,
  * token counts, quality scores ×1000) the scalable exact answer is a
  * histogram: the only corpus-sized operation is a map-side-combined
  * count per (stratum, value) — state bounded by |domain|, not |corpus| —
  * and the quantile extraction then runs on |strata|·|domain| tiny rows. */
object Profile {

  /** Exact deciles (k = 1..9) of `valueCol` per `stratum`: the smallest
    * value v whose cumulative count reaches ⌈k·n/10⌉ (discrete lower
    * quantile). One corpus shuffle (the histogram agg); the window and
    * the decile explode touch histogram rows only. */
  def deciles(docs: DataFrame, valueCol: String = "n_chars",
              stratum: String = "source"): DataFrame = {
    val hist = docs.groupBy(col(stratum), col(valueCol).as("v"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(stratum).orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(stratum)
    hist
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("total", sum(col("cnt")).over(wAll))
      .select(col(stratum), col("v"), col("cnt"), col("cum"), col("total"),
        explode(sequence(lit(1), lit(9))).as("k"))
      // target rank ⌈k·total/10⌉ as integer math (exact below 2^53)
      .withColumn("target",
        floor((col("k") * col("total") + 9).cast("double") / 10).cast("long"))
      .where(col("cum") >= col("target") &&
        (col("cum") - col("cnt")) < col("target"))
      .select(col(stratum), col("k").cast("long").as("decile"),
        col("v").cast("long").as("value"))
  }

  /** Corpus concentration report — the one-row audit a mixture designer
    * reads before weighting: domain count, the biggest domain's share,
    * and the Herfindahl–Hirschman index over permille shares (10⁶ = one
    * domain owns the corpus; 10⁶/n = perfectly uniform). All integer —
    * shares in permille, HHI = Σ share² div 1000 — so the oracle replays
    * it exactly; a float HHI would drift with summation order.
    *
    * Scale shape: one algebraic (domain, count) rollup over the corpus,
    * materialized once (localCheckpoint) so the total and the shares both
    * read the domain-sized table, not the corpus; the 1-row total
    * re-attaches as a broadcast. No window — an unpartitioned window
    * would funnel every domain row into one task. */
  def concentration(normalized: DataFrame): DataFrame = {
    val perDomain = normalized.groupBy(col("domain"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val total = perDomain.agg(sum(col("n")).as("total"))
    perDomain.crossJoin(broadcast(total))
      .select(expr("n * 1000 div total").as("share_permille"), col("total"))
      .agg(count(lit(1)).as("n_domains"),
           max(col("total")).as("total_docs"),
           max(col("share_permille")).as("top_share_permille"),
           expr("CAST(sum(share_permille * share_permille) div 1000 AS BIGINT)")
             .as("hhi"))
  }
}
