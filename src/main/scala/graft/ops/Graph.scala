package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph operators — the crawl-prioritization signal (authority
  * scores feed per-domain fetch budgets). PageRank here is INTEGER
  * PageRank: scores live in micro-units and every step is integer
  * arithmetic (floor division, integer sums), so results are exactly
  * order-independent — the same bits on any partitioning, any engine.
  * Float PageRank cannot be oracled exactly (sum order drifts ULPs);
  * integer PageRank can, and at web scale the quantization error is
  * irrelevant for ranking. */
object Graph {

  /** Deterministic synthetic out-links for a node set 0..n−1 (the corpus
    * has no link column): each node links to three affine images of its
    * id, self-loops and duplicate targets removed. Mirrored verbatim in
    * the DuckDB oracle. */
  def synthEdges(nodes: DataFrame, n: Long): DataFrame = {
    val id = col("id")
    nodes.select(id, explode(array_distinct(array(
        (id * 7 + 3) % n, (id * 13 + 11) % n, (id * 31 + 17) % n))).as("dst"))
      .where(col("dst") =!= id)
      .select(id.as("src"), col("dst"))
  }

  /** `iters` rounds of integer PageRank with damping 0.85 in micro-units:
    * score₀ = 10⁶; per edge contrib = score div outdeg; scoreₖ₊₁ =
    * 150000 + (85 · Σ contribs) div 100. Dangling in-degrees coalesce
    * to 0; every node keeps a row.
    *
    * Scale shape: the edge table (with outdeg) is computed once and
    * cached pre-partitioned; each round shuffles only (dst, contrib)
    * pairs — 16-byte rows — and the node-sized score table. Rounds are
    * a fixed count (crawl scoring runs 5–10), not a convergence loop, so
    * the lineage is bounded; at 10^12 edges each round is one
    * sort-merge join on src plus one partial-aggregated shuffle on dst. */
  def pageRankInt(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val e = edges.join(deg, "src")
    val ids = nodes.select(col("id"))
    var scores = ids.select(col("id"), lit(1000000L).as("score"))
    for (_ <- 1 to iters) {
      val contribs = e.join(scores, e("src") === scores("id"))
        .select(col("dst"),
          floor(col("score").cast("double") / col("outdeg")).as("contrib"))
        .groupBy("dst").agg(sum(col("contrib")).as("c"))
      scores = ids.join(contribs, ids("id") === contribs("dst"), "left")
        .select(col("id"),
          (lit(150000L) +
            floor(coalesce(col("c"), lit(0L)).cast("double") * 85 / 100)
              .cast("long")).as("score"))
    }
    scores
  }

  /** Integer TrustRank (Gyöngyi, Garcia-Molina & Pedersen, VLDB 2004):
    * PageRank with initial mass AND teleport restricted to a trusted seed
    * set — trust flows out along links, so spam farms that rank high on
    * raw PageRank score near zero here (low trust × high rank = the
    * classic spam-mass signal for corpus curation). Same micro-unit
    * integer arithmetic as [[pageRankInt]] — bit-exact on any
    * partitioning or engine — and the same per-round shape: one
    * sort-merge join on src plus one partial-aggregated (dst, contrib)
    * shuffle of 16-byte rows; the seed flag rides the node table.
    *
    * Input nodes: (id, is_seed). Output: (id, is_seed, score). */
  def trustRankInt(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val e = edges.join(deg, "src")
    val ids = nodes.select(col("id"), col("is_seed"))
    var scores = ids.select(col("id"),
      when(col("is_seed"), lit(1000000L)).otherwise(lit(0L)).as("score"))
    for (_ <- 1 to iters) {
      val contribs = e.join(scores, e("src") === scores("id"))
        .select(col("dst"),
          floor(col("score").cast("double") / col("outdeg")).as("contrib"))
        .groupBy("dst").agg(sum(col("contrib")).as("c"))
      scores = ids.join(contribs, ids("id") === contribs("dst"), "left")
        .select(col("id"),
          (when(col("is_seed"), lit(150000L)).otherwise(lit(0L)) +
            floor(coalesce(col("c"), lit(0L)).cast("double") * 85 / 100)
              .cast("long")).as("score"))
    }
    ids.join(scores, Seq("id")).select(col("id"), col("is_seed"), col("score"))
  }
}
