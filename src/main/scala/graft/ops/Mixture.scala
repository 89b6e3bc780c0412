package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus mixture solver: given a per-source target weight, an epoch cap,
  * and a total token budget, compute the token allocation each source
  * contributes to a training mix — the data-mixing step every large-scale
  * LM pipeline runs after cleaning (fixed-weight mixtures in the Pile /
  * LLaMA style, where low-resource sources are bounded by a maximum number
  * of repetition epochs).
  *
  * The optimum is classic water-filling: allocate proportionally to weight,
  * but no source may exceed its cap (available tokens × max epochs); budget
  * freed by capped sources is redistributed proportionally among the rest.
  * Rather than iterate, we use the exact closed form: sort sources by
  * cap/weight ascending — the capped set is then a PREFIX, and a source is
  * capped iff its cap is below its proportional share of what remains after
  * capping every earlier source:
  *
  *   capped(s)  ⇔  cap_s · (W − W_prev(s))  <  w_s · (T − C_prev(s))
  *
  * with W = Σ weights, T = min(budget, Σ caps), and C_prev/W_prev the
  * exclusive prefix sums in sort order. (Once false it stays false: if a
  * source's cap covers its share, every later source — larger cap/weight —
  * is covered too, so the greedy prefix test IS the fixed point.) Uncapped
  * sources get floor(w_s · (T − C_K) / (W − W_K)) over the final capped set
  * K. All comparisons and divisions are int64 (`div`), so the DuckDB oracle
  * reproduces every value bit-for-bit; products stay < 2^63 for any
  * cap·ΣW < 9.2e18 (restate over DECIMAL if a corpus ever exceeds that).
  *
  * Scale shape: the only distributed work is the per-source token-total
  * aggregation (one map-side-combined hash shuffle over the corpus — the
  * 10^12-row pass). The solver itself runs on ONE ROW PER SOURCE, so the
  * unpartitioned windows below move at most #sources rows (tens) to a
  * single task — driver-sized by construction, never corpus-sized.
  */
object Mixture {

  /** @param weightX1000 target mixture weight per source (×1000 integer),
    *                    evaluated against the per-source aggregate row (may
    *                    reference `source`).
    * @param budgetTokens   total token budget T for the mix.
    * @param maxEpochsX1000 repetition bound per source, ×1000 (2000 = a
    *                       source may be seen at most twice). */
  def allocate(
      docs: DataFrame,
      weightX1000: Column,
      budgetTokens: Long,
      maxEpochsX1000: Long = 2000L): DataFrame = {
    val perSource = docs
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextStats.tokenCountCol(col("text"))).as("avail_tokens"))
      .select(
        col("source"), col("n_docs"), col("avail_tokens"),
        weightX1000.cast("long").as("weight_x1000"),
        expr(s"avail_tokens * $maxEpochsX1000 div 1000").as("cap_tokens"))

    // One row per source from here on: single-partition windows are the
    // point (the data is solver-state, not corpus), shared partition key so
    // the Exchange is planned once.
    val part = Window.partitionBy(lit(1))
    val byRatio = part.orderBy(
      (col("cap_tokens").cast("double") / col("weight_x1000").cast("double")).asc,
      col("source").asc)
    val prefix = byRatio.rowsBetween(Window.unboundedPreceding, -1)
    val whole = part.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    val staged = perSource
      .select(
        col("*"),
        coalesce(sum(col("cap_tokens")).over(prefix), lit(0L)).as("c_prev"),
        coalesce(sum(col("weight_x1000")).over(prefix), lit(0L)).as("w_prev"),
        sum(col("weight_x1000")).over(whole).as("w_all"),
        least(lit(budgetTokens), sum(col("cap_tokens")).over(whole)).as("t_total"))
      .withColumn("capped",
        col("cap_tokens") * (col("w_all") - col("w_prev")) <
          col("weight_x1000") * (col("t_total") - col("c_prev")))
      .select(
        col("*"),
        coalesce(sum(when(col("capped"), col("cap_tokens"))).over(whole), lit(0L)).as("c_capped"),
        coalesce(sum(when(col("capped"), col("weight_x1000"))).over(whole), lit(0L)).as("w_capped"))
      .withColumn("alloc_tokens",
        when(col("capped") || col("w_all") === col("w_capped"), col("cap_tokens"))
          .otherwise(expr("weight_x1000 * (t_total - c_capped) div (w_all - w_capped)"))
          .cast("long"))

    staged.select(
      col("source"),
      col("weight_x1000"),
      col("n_docs").cast("long").as("n_docs"),
      col("avail_tokens").cast("long").as("avail_tokens"),
      col("cap_tokens").cast("long").as("cap_tokens"),
      col("capped").cast("int").as("capped"),
      col("alloc_tokens"),
      when(col("avail_tokens") > 0, expr("alloc_tokens * 1000 div avail_tokens"))
        .otherwise(0L).cast("long").as("epochs_x1000"),
      when(col("t_total") > 0, expr("alloc_tokens * 1000000 div t_total"))
        .otherwise(0L).cast("long").as("share_x1e6"))
  }

  /** Temperature-balanced multilingual sampling (the mT5 / XLM-R
    * α-exponent recipe, α = 1/2 made INTEGER-exact): language weights are
    * ⌊√n_l⌋ — flattening the raw distribution so low-resource languages
    * upsample and the head language stops dominating — then `budgetDocs`
    * slots split by the Hamilton largest-remainder method
    * ([[Frontier.budget]]). √ via IEEE double sqrt is correctly rounded,
    * so ⌊√n⌋ is the identical integer in the JVM and DuckDB for any
    * corpus size that fits int64's exact-double range (n < 2⁵²); every
    * step after the floor is int64. `epochs_x1000` is the per-language
    * upsampling factor the mT5 table reports.
    *
    * Scale shape: one lang-count rollup (map-side combined) and
    * lang-cardinality tables thereafter — the one global sort is over
    * |languages| rows. */
  def temperatureMix(docs: DataFrame, budgetDocs: Long): DataFrame = {
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      .localCheckpoint(true) // read twice: weights + the final join back
    val weights = counts.select(col("lang").as("domain"),
      expr("CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT)").as("weight"))
    Frontier.budget(weights, budgetDocs, cap = Long.MaxValue / 2)
      .join(counts.withColumnRenamed("lang", "domain"), "domain")
      .select(col("domain").as("lang"), col("n_docs"), col("weight"),
        col("alloc"),
        expr("alloc * 1000 div n_docs").as("epochs_x1000"))
  }
}
