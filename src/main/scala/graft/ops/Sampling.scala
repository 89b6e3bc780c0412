package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic corpus sampling — the mixture-control step of a training
  * pipeline (per-source rates: keep all of wiki, 10% of web, …).
  *
  * Hash-threshold selection (`md5(salt:doc_id) mod 1000 < rate(source)`)
  * instead of rank-per-stratum: ZERO shuffle — a pure codegen'd filter on
  * the scan, trivially reproducible across reruns and engines, and immune
  * to stratum skew (a rank window would sort every hot stratum). The cost
  * at 10^12 rows is one narrow pass; changing the mix re-runs only the
  * filter. */
object Sampling {

  /** Little-endian uint64 of the first 8 md5 bytes, mod 1000 — exactly
    * DuckDB's `md5_number_upper(s) % 1000`, built from codegen'd builtins:
    * the hex pairs are reversed into the little-endian hex string, conv'd
    * base 16→10 (unsigned), compared in decimal (2^64 needs 20 digits). */
  def md5Bucket(s: Column): Column = {
    val h = md5(s)
    val le = concat((7 to 0 by -1).map(i => substring(h, 1 + 2 * i, 2)): _*)
    pmod(conv(le, 16, 10).cast(DecimalType(20, 0)), lit(1000)).cast("int")
  }

  /** Keep each document iff its salted hash bucket falls under its
    * stratum's per-mille rate. `rates` maps stratum → permille (0–1000);
    * absent strata use `defaultPermille`. The rate map ships as a literal
    * inside the projection — no join, no shuffle, no UDF. */
  def stratifiedSample(docs: DataFrame, rates: Map[String, Int],
                       defaultPermille: Int, stratum: String = "source",
                       salt: String = "sample"): DataFrame = {
    val bucket = md5Bucket(concat(lit(s"$salt:"), col("doc_id").cast("string")))
    val rate = coalesce(element_at(typedLit(rates), col(stratum)),
      lit(defaultPermille))
    docs.select(col("doc_id"), col(stratum), bucket.as("bucket"))
      .where(col("bucket") < rate)
  }
}
