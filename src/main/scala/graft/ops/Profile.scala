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
}
