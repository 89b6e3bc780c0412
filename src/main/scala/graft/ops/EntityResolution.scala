package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage) with Fellegi–Sunter-style integer
  * agreement weights — the structured-record twin of the text dedup family:
  * customer-shaped records are blocked on stable coarse attributes, compared
  * field-by-field inside blocks, and matched when the summed agreement
  * evidence clears a threshold. Everything is CASE/substr/integer
  * arithmetic, so the DuckDB oracle replays the full decision.
  *
  * Scale shape: candidates exist only inside (nation, segment) blocks, each
  * salt-capped at `maxBlock` members by a deterministic row_number — never
  * an all-pairs product; only short id/name/phone fields shuffle. */
object EntityResolution {

  /** Dirty-record corpus: customers get a deterministic synthetic phone
    * (pure custkey arithmetic — regenerable in SQL) and exact account
    * cents; every custkey % 53 == 7 gains a replica at +1000000 with the
    * name case-flipped and the phone's last digit bumped — same nation and
    * segment, so the replica stays inside its block. */
  def dirtyCustomers(cust: DataFrame): DataFrame = {
    val base = cust.select(
      col("c_custkey").as("key"),
      col("c_name").as("name"),
      col("c_nationkey").cast("long").as("nation"),
      col("c_mktsegment").as("segment"),
      expr("""concat(CAST(10 + c_custkey % 89 AS STRING), '-',
             |  lpad(CAST(c_custkey % 1000 AS STRING), 3, '0'), '-',
             |  lpad(CAST((c_custkey * 7) % 10000 AS STRING), 4, '0'))"""
        .stripMargin).as("phone"),
      expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("acct_cents"))
    val replicas = base.where(col("key") % 53 === 7)
      .select((col("key") + 1000000L).as("key"),
        upper(col("name")).as("name"),
        col("nation"), col("segment"),
        expr("""concat(substr(phone, 1, length(phone) - 1),
               |  CAST((CAST(substr(phone, length(phone), 1) AS BIGINT) + 1) % 10
               |       AS STRING))""".stripMargin).as("phone"),
        col("acct_cents"))
    base.unionByName(replicas)
  }

  /** Blocked pairwise scoring: name (lowercased exact, +40), phone exact
    * (+25), phone prefix-6 (+10, the "same exchange" partial), account
    * cents (+15). A planted replica scores 40 + 10 + 15 = 65; unrelated
    * records can collect at most prefix+cents = 25 < threshold. Emits only
    * pairs at or above `threshold`. */
  def resolve(recs: DataFrame, threshold: Long = 50,
              maxBlock: Int = 64): DataFrame = {
    val blocked = recs
      .withColumn("rn", row_number().over(
        Window.partitionBy("nation", "segment")
          .orderBy((col("key") % 1000000L).asc, col("key").asc)))
      .where(col("rn") <= maxBlock)
    val a = blocked.select(col("nation"), col("segment"),
      col("rn").as("rn_a"), col("key").as("key_a"),
      col("name").as("name_a"), col("phone").as("phone_a"),
      col("acct_cents").as("cents_a"))
    val b = blocked.select(col("nation"), col("segment"),
      col("rn").as("rn_b"), col("key").as("key_b"),
      col("name").as("name_b"), col("phone").as("phone_b"),
      col("acct_cents").as("cents_b"))
    a.join(b, Seq("nation", "segment"))
      .where(col("rn_a") < col("rn_b"))
      .withColumn("name_pts",
        when(lower(col("name_a")) === lower(col("name_b")), 40L).otherwise(0L))
      .withColumn("phone_pts",
        when(col("phone_a") === col("phone_b"), 25L).otherwise(0L))
      .withColumn("prefix_pts",
        when(col("phone_pts") === 0L &&
          substring(col("phone_a"), 1, 6) === substring(col("phone_b"), 1, 6),
          10L).otherwise(0L))
      .withColumn("cents_pts",
        when(col("cents_a") === col("cents_b"), 15L).otherwise(0L))
      .withColumn("score",
        col("name_pts") + col("phone_pts") + col("prefix_pts") +
          col("cents_pts"))
      .where(col("score") >= threshold)
      .select(
        least(col("key_a"), col("key_b")).as("key_a"),
        greatest(col("key_a"), col("key_b")).as("key_b"),
        col("name_pts"), col("phone_pts"), col("prefix_pts"),
        col("cents_pts"), col("score"))
  }
}
