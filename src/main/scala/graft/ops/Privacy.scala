package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Release-gating privacy audits over structured records: k-anonymity and
  * l-diversity of quasi-identifier equivalence classes — the structured
  * complement of the regex PII scan ([[TextStats.piiStats]]). A dataset is
  * k-anonymous when every quasi-identifier combination is shared by ≥ k
  * rows; l-diverse when each class carries ≥ l distinct sensitive values.
  * Publishing a "fully anonymized" table that fails either gate is the
  * classic re-identification hole.
  *
  * Scale shape: ONE group-by on the quasi-identifier tuple (map-side
  * combined counts + one distinct-sensitive aggregate); the class table is
  * QI-cardinality-sized regardless of row count. All integer CASE/div
  * arithmetic — the DuckDB oracle replays it exactly. */
object Privacy {

  /** k-anonymity / l-diversity audit over customers with quasi-identifiers
    * (nation, 1000-currency-unit balance bucket) and sensitive attribute
    * mktsegment. The bucket shifts cents by +100000 before dividing so
    * negative balances land in non-negative, contiguous bucket ids
    * (truncating division would otherwise fold (−999, 999) into one
    * double-width bucket 0; Spark `div` and DuckDB `//` both truncate
    * toward zero — verified: −417//46 = −9 in both). */
  def kAnonymity(cust: DataFrame, kMin: Long = 5, lMin: Long = 2): DataFrame =
    cust
      .select(col("c_nationkey").cast("long").as("nation"),
        expr("(CAST(round(c_acctbal * 100) AS BIGINT) + 100000) div 100000")
          .as("bal_bucket"),
        col("c_mktsegment").as("segment"))
      .groupBy("nation", "bal_bucket")
      .agg(count(lit(1)).as("k"),
        countDistinct(col("segment")).as("l"))
      .withColumn("k_violation", col("k") < kMin)
      .withColumn("l_violation", col("l") < lMin)

  /** One-row release summary: class count, worst-case k and l, rows living
    * in violating classes (the re-identifiable population), and the gate
    * verdict. Runs on the class table, so it costs one bounded pass. */
  def releaseGate(cust: DataFrame, kMin: Long = 5, lMin: Long = 2): DataFrame =
    kAnonymity(cust, kMin, lMin).agg(
      count(lit(1)).as("n_classes"),
      min(col("k")).as("k_min"),
      min(col("l")).as("l_min"),
      sum(when(col("k_violation"), col("k")).otherwise(0L))
        .as("rows_in_k_violations"),
      sum(when(col("l_violation"), col("k")).otherwise(0L))
        .as("rows_in_l_violations"),
      (sum(when(col("k_violation") || col("l_violation"), 1L)
        .otherwise(0L)) === 0L).as("releasable"))
}
