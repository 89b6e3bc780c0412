package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pipeline-economics planners: pick the cheapest ORDER for a short-circuit
  * quality-gate cascade from measured reject rates, and assign documents to
  * size-balanced shards. Both are "plan from one cheap corpus pass, then
  * reason on a bounded table" shapes — the corpus never moves twice. */
object PipelinePlan {

  /** Measured per-gate reject rates for four synthetic quality gates of
    * very different unit cost (cost_milli = relative CPU per doc,
    * pinned constants): g1_short (token floor, cheapest), g2_stopword
    * (' the ' presence), g3_article (' a ' coverage), g4_scan (full-text
    * substring scan, priciest). ONE map-side-combined corpus pass emits
    * all four counts. */
  def gateRates(docs: DataFrame): DataFrame = {
    val tok = TextStats.tokenCountCol(col("text"))
    // plain (non-regex) replace is global left-to-right in BOTH engines;
    // the length delta is 5·occ(' the ') / 3·occ(' a ') — compared in the
    // delta domain so everything stays integer
    val dThe = length(col("text")) -
      length(expr("replace(text, ' the ', '')"))
    val dA = length(col("text")) -
      length(expr("replace(text, ' a ', '')"))
    val hasQuery = col("text").contains("query")
    val flagged = docs.select(
      when(tok < 40, 1L).otherwise(0L).as("r1"),
      when(dThe === 0, 1L).otherwise(0L).as("r2"),
      when(dA < 6, 1L).otherwise(0L).as("r3"),
      when(!hasQuery, 1L).otherwise(0L).as("r4"))
    val agg = flagged.agg(count(lit(1)).as("n"),
      sum(col("r1")).as("k1"), sum(col("r2")).as("k2"),
      sum(col("r3")).as("k3"), sum(col("r4")).as("k4"))
    agg.select(explode(array(
      struct(lit("g1_short").as("gate"), lit(1L).as("cost_milli"),
        expr("k1 * 1000 div n").as("reject_pm")),
      struct(lit("g2_stopword").as("gate"), lit(10L).as("cost_milli"),
        expr("k2 * 1000 div n").as("reject_pm")),
      struct(lit("g3_article").as("gate"), lit(25L).as("cost_milli"),
        expr("k3 * 1000 div n").as("reject_pm")),
      struct(lit("g4_scan").as("gate"), lit(60L).as("cost_milli"),
        expr("k4 * 1000 div n").as("reject_pm")))).as("g"))
      .select(col("g.gate"), col("g.cost_milli"), col("g.reject_pm"))
  }

  /** Short-circuit cascade ordering: for independent gates the expected
    * cost Σᵢ costᵢ·Π_{j<i} pass_j is minimized by running gates in
    * ascending cost-to-kill ratio (exchange argument) — ratio_micro =
    * cost_milli·1,000,000 div max(reject_pm, 1). The expected-cost chain
    * is folded over the (gate-count-sized) plan table with a floor at
    * every step: surv_before_pm is the permille of documents still alive
    * when a gate runs, cum_cost_micro the accumulated expected spend.
    * Corpus cost: the ONE pass inside [[gateRates]]. */
  def gateCascadePlan(docs: DataFrame): DataFrame = {
    val ranked = gateRates(docs)
      .withColumn("ratio_micro",
        expr("cost_milli * 1000000 div greatest(reject_pm, 1)"))
      .withColumn("rank_opt", row_number().over(
        Window.orderBy(col("ratio_micro").asc, col("gate").asc)))
    ranked
      .agg(sort_array(collect_list(struct(col("rank_opt"), col("gate"),
        col("cost_milli"), col("reject_pm"), col("ratio_micro")))).as("gs"))
      .select(explode(expr(
        """aggregate(gs,
          |  named_struct('s', CAST(1000 AS BIGINT), 'c', CAST(0 AS BIGINT),
          |    'out', CAST(array() AS ARRAY<STRUCT<rank_opt: INT, gate: STRING,
          |      cost_milli: BIGINT, reject_pm: BIGINT, ratio_micro: BIGINT,
          |      surv_before_pm: BIGINT, cum_cost_micro: BIGINT>>)),
          |  (acc, x) -> named_struct(
          |    's', acc.s * (1000 - x.reject_pm) div 1000,
          |    'c', acc.c + x.cost_milli * acc.s,
          |    'out', concat(acc.out, array(named_struct(
          |      'rank_opt', x.rank_opt, 'gate', x.gate,
          |      'cost_milli', x.cost_milli, 'reject_pm', x.reject_pm,
          |      'ratio_micro', x.ratio_micro,
          |      'surv_before_pm', acc.s,
          |      'cum_cost_micro', acc.c + x.cost_milli * acc.s)))),
          |  acc -> acc.out)""".stripMargin)).as("r"))
      .select(col("r.rank_opt").cast("long").as("rank_opt"), col("r.gate"),
        col("r.cost_milli"), col("r.reject_pm"), col("r.ratio_micro"),
        col("r.surv_before_pm"), col("r.cum_cost_micro"))
  }

  /** Size-balanced shard assignment: serpentine (boustrophedon) placement
    * over the size-descending rank — the deterministic, SQL-replayable
    * cousin of LPT greedy bin packing. Row r (0-based) goes to shard
    * `r mod k` on even passes and `k−1−(r mod k)` on odd passes, which
    * pairs heavy rows with light ones pass-over-pass. Emits per-shard
    * totals and skew_pm vs the ideal equal split.
    *
    * Scale note: the global rank is a full sort of (id, size) pairs —
    * fine for layout planning over file/partition metadata (the intended
    * input); for raw 10^12-doc tables run it per size-bucket summary
    * first. */
  def shardBalance(docs: DataFrame, k: Int = 8): DataFrame = {
    val sized = docs.select(col("doc_id"),
      length(col("text")).cast("long").as("bytes"))
      .withColumn("r", row_number().over(
        Window.orderBy(col("bytes").desc, col("doc_id").asc)) - 1)
      .withColumn("shard", expr(
        s"CASE WHEN (r div $k) % 2 = 0 THEN r % $k ELSE $k - 1 - (r % $k) END"))
    val per = sized.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("bytes")).as("bytes"))
    val tot = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    per
      .withColumn("total", sum(col("bytes")).over(tot))
      .withColumn("skew_pm", expr(s"bytes * 1000 * $k div total"))
      .drop("total")
      .select(col("shard").cast("long").as("shard"), col("n_docs"),
        col("bytes"), col("skew_pm"))
  }

  /** EXACT Shapley attribution of rejected documents across the four
    * gates — the order-free complement of first-reason attribution
    * (`corpus_drop_attribution`): φᵢ = Σ_{S∌i} w(|S|)·[v(S∪{i})−v(S)]
    * with v(S) = docs rejected by ANY gate in S. With n=4 the weights
    * s!(3−s)!/4! are 3/12, 1/12, 1/12, 3/12 — carried as integer
    * twelfths, so everything is exact and Σφᵢ = 12·v(N) (efficiency)
    * holds bit-for-bit.
    *
    * Scale shape: ONE corpus pass folds each doc to a 4-bit reject
    * pattern and counts the ≤16 patterns; v(S), the 8 marginals per
    * gate, and the weights all run on 16-row tables. Adding a gate costs
    * one bit, not a corpus pass. */
  def gateShapley(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tok = TextStats.tokenCountCol(col("text"))
    val dThe = length(col("text")) -
      length(expr("replace(text, ' the ', '')"))
    val dA = length(col("text")) -
      length(expr("replace(text, ' a ', '')"))
    val pat = docs.select(
      (when(tok < 40, 1L).otherwise(0L) +
        when(dThe === 0, 2L).otherwise(0L) +
        when(dA < 6, 4L).otherwise(0L) +
        when(!col("text").contains("query"), 8L).otherwise(0L)).as("p"))
      .groupBy("p").agg(count(lit(1)).as("cnt"))
    val subsets = spark.range(16).select(col("id").as("s"))
    val v = subsets.join(pat, expr("(s & p) <> 0"), "left")
      .groupBy("s").agg(coalesce(sum(col("cnt")), lit(0L)).as("v"))
    val gates = Seq(("g1_short", 1L), ("g2_stopword", 2L),
      ("g3_article", 4L), ("g4_scan", 8L)).toDF("gate", "bit")
    val marginals = gates.crossJoin(subsets)
      .where(expr("(s & bit) = 0"))
      .withColumn("s_with", col("s") + col("bit"))
      .join(v.select(col("s"), col("v").as("v_s")), Seq("s"))
      .join(v.select(col("s").as("s_with"), col("v").as("v_si")),
        Seq("s_with"))
      .withColumn("w12", expr(
        "CASE bit_count(s) WHEN 0 THEN 3 WHEN 1 THEN 1 WHEN 2 THEN 1 ELSE 3 END")
        .cast("long"))
    val phi = marginals.groupBy("gate", "bit")
      .agg(sum(col("w12") * (col("v_si") - col("v_s"))).as("phi_twelfths"))
    val tot = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    phi
      .withColumn("total_twelfths", sum(col("phi_twelfths")).over(tot))
      .withColumn("share_pm", expr(
        "phi_twelfths * 1000 div greatest(total_twelfths, 1)"))
      .select(col("gate"), col("bit"), col("phi_twelfths"),
        col("total_twelfths"), col("share_pm"))
  }

  /** Truncation-budget curve: for each candidate context cap, what share
    * of documents survives intact and what share of the token mass is
    * kept — the decision table for "what sequence length do we train
    * at". ONE corpus pass: all caps are conditional sums in the same
    * map-side-combined aggregate; exploding the 4 cap rows happens on
    * the single result row. */
  def truncationCurve(docs: DataFrame,
                      caps: Seq[Long] = Seq(32L, 64L, 128L, 256L)): DataFrame = {
    val tok = TextStats.tokenCountCol(col("text"))
    val aggExprs = Seq(count(lit(1)).as("n"), sum(col("t")).as("tot")) ++
      caps.flatMap(c => Seq(
        sum(when(col("t") > c, 1L).otherwise(0L)).as(s"cut_$c"),
        sum(least(col("t"), lit(c))).as(s"kept_$c")))
    val aggs = docs.select(tok.as("t"))
      .agg(aggExprs.head, aggExprs.tail: _*)
    aggs.select(explode(array(caps.map(c => struct(
      lit(c).as("cap"),
      col("n"),
      col(s"cut_$c").as("n_truncated"),
      expr(s"(n - cut_$c) * 1000 div n").as("docs_intact_pm"),
      col(s"kept_$c").as("tokens_kept"),
      expr(s"kept_$c * 1000 div tot").as("tokens_kept_pm"))): _*)).as("r"))
      .select(col("r.cap"), col("r.n").as("n_docs"), col("r.n_truncated"),
        col("r.docs_intact_pm"), col("r.tokens_kept"),
        col("r.tokens_kept_pm"))
  }

  /** Feature-hashing collision audit for a 2^b-bucket hashed
    * bag-of-words model: how many vocabulary words share buckets, and —
    * the number that actually matters — how much TOKEN MASS sits in
    * collided buckets (a collision on two rare words is noise; on two
    * frequent words it merges features). md5-routed buckets replay in
    * DuckDB; one token explode feeds both the vocab and mass sides. */
  def featureHashAudit(docs: DataFrame, buckets: Long = 4096L): DataFrame = {
    val words = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("mass"))
      .withColumn("b", Sampling.md5Mod(concat(lit("fh:"), col("w")), buckets))
    val perBucket = words.groupBy("b")
      .agg(count(lit(1)).as("nw"), sum(col("mass")).as("bmass"))
    perBucket.agg(
      sum(col("nw")).as("n_vocab"),
      count(lit(1)).as("n_buckets_occupied"),
      sum(when(col("nw") >= 2, 1L).otherwise(0L)).as("n_collided_buckets"),
      sum(when(col("nw") >= 2, col("nw")).otherwise(0L))
        .as("collided_words"),
      sum(col("bmass")).as("token_mass"),
      sum(when(col("nw") >= 2, col("bmass")).otherwise(0L))
        .as("collided_mass"))
      .select(col("n_vocab"), col("n_buckets_occupied"),
        col("n_collided_buckets"), col("collided_words"),
        expr("collided_words * 1000 div greatest(n_vocab, 1)")
          .as("collision_pm"),
        expr("collided_mass * 1000 div greatest(token_mass, 1)")
          .as("collided_mass_pm"))
  }

  /** Exact proportional allocation of `slots` eval seats across strata
    * (Hamilton / largest-remainder method): floor quotas, then the
    * leftover seats go to the largest remainders (stratum-name
    * tie-break). The principled "how many eval docs per language" answer
    * — hash sampling approximates these proportions, this pins them.
    * One stratum count aggregate; the apportionment runs on the
    * stratum-sized table. */
  def hamiltonAllocation(docs: DataFrame, stratum: String = "lang",
                         slots: Long = 100L): DataFrame = {
    val counts = docs.groupBy(col(stratum).as("stratum"))
      .agg(count(lit(1)).as("n_docs"))
    val tot = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val based = counts
      .withColumn("n", sum(col("n_docs")).over(tot))
      .withColumn("base", expr(s"$slots * n_docs div n"))
      .withColumn("remainder", expr(s"($slots * n_docs) % n"))
      .withColumn("leftover", lit(slots) - sum(col("base")).over(tot))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("remainder").desc, col("stratum").asc)))
    based
      .withColumn("extra", when(col("rk") <= col("leftover"), 1L)
        .otherwise(0L))
      .withColumn("alloc", col("base") + col("extra"))
      .select(col("stratum"), col("n_docs"), col("base"), col("remainder"),
        col("extra"), col("alloc"))
  }

  /** Deterministic source-interleaved training order: rank documents
    * within their source (by doc_id), then schedule by (within-rank,
    * source) — round-robin across sources, so no source repeats inside
    * any window of |active sources| and a hot source cannot monopolize a
    * training stretch (the non-random complement of the md5 shuffle,
    * used when mixing ratios must be exact early in training). Emits the
    * first `take` schedule positions.
    *
    * Scale note: the global position is a sort over (rank, source) —
    * production interleaves per shard and concatenates; the per-source
    * rank windows are the real work and they partition cleanly. */
  def trainInterleave(docs: DataFrame, take: Int = 60): DataFrame = {
    val wSrc = Window.partitionBy("source").orderBy("doc_id")
    docs.select(col("doc_id"), col("source"))
      .withColumn("r", row_number().over(wSrc))
      .withColumn("position", row_number().over(
        Window.orderBy(col("r").asc, col("source").asc)))
      .where(col("position") <= take)
      .select(col("position").cast("long").as("position"), col("doc_id"),
        col("source"), col("r").cast("long").as("src_rank"))
  }

  /** Rank-blended quality score: three cheap signals (token count,
    * distinct-word ratio, sentence-period count) are converted to
    * PER-LANGUAGE permille percentile ranks and averaged — rank fusion
    * is scale-free, so no signal's units dominate and outliers can't
    * drag the blend (the corpus-scoring twin of retrieval RRF). Windows
    * partition by lang — no global sort; ties break by doc_id so both
    * engines agree. Emits the doc_id < `cap` audit slice. */
  def qualityRankBlend(docs: DataFrame, cap: Long = 100L): DataFrame = {
    val tok = TextStats.tokenCountCol(col("text"))
    val scored = docs.select(col("doc_id"), col("lang"),
      tok.as("s_tok"),
      expr("""CAST(size(array_distinct(filter(split(text, ' '), x -> x <> '')))
             |  * 1000 AS BIGINT)
             |div greatest(CAST(size(filter(split(text, ' '), x -> x <> ''))
             |  AS BIGINT), 1)""".stripMargin).as("s_distinct"),
      (length(col("text")) - length(expr("replace(text, '.', '')")))
        .cast("long").as("s_period"))
    def rankPm(c: String) = {
      val w = Window.partitionBy("lang").orderBy(col(c).asc,
        col("doc_id").asc)
      val n = Window.partitionBy("lang")
      // double-div + trunc == integer floor-div here: the quotient of two
      // ints can only round across an integer boundary when the divisor
      // exceeds ~1.7e13 (distance to the integer is ≥ 1/b vs ulp ~6e-14),
      // far past any per-language stratum
      (row_number().over(w) - 1) * 1000 /
        greatest(count(lit(1)).over(n) - 1, lit(1L))
    }
    scored
      .withColumn("r_tok_pm", rankPm("s_tok").cast("long"))
      .withColumn("r_distinct_pm", rankPm("s_distinct").cast("long"))
      .withColumn("r_period_pm", rankPm("s_period").cast("long"))
      .withColumn("blend_pm", expr(
        "(r_tok_pm + r_distinct_pm + r_period_pm) div 3"))
      .where(col("doc_id") < cap)
      .select(col("doc_id"), col("lang"), col("r_tok_pm"),
        col("r_distinct_pm"), col("r_period_pm"), col("blend_pm"))
  }

  /** Water-filling token-budget trim: find the single common cap C such
    * that Σ_s min(tokens_s, C) fills the budget — the uniform-ceiling
    * mixture trim that protects small sources (they keep everything)
    * while hot sources absorb the whole cut. Sources sorted by token
    * count ascending; C sits at the first rank j where keeping ranks < j
    * whole and giving the rest t_j would bust the budget:
    * C = (B − prefix_{j−1}) div (k−j+1). Budget ≥ total → no trim
    * (C = max). One source rollup; the fill point and cap come from
    * windows on the source-sized table. */
  def mixtureWaterfill(docs: DataFrame, budget: Long = 20000L): DataFrame = {
    val tok = TextStats.tokenCountCol(col("text"))
    val per = docs.groupBy("source").agg(sum(tok).as("t"))
    val wAsc = Window.orderBy(col("t").asc, col("source").asc)
    val tot = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val rows = per
      .withColumn("j", row_number().over(wAsc))
      .withColumn("prefix", sum(col("t")).over(
        wAsc.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("k", count(lit(1)).over(tot))
      .withColumn("total", sum(col("t")).over(tot))
      .withColumn("infeasible",
        col("prefix") - col("t") +
          (col("k") - col("j") + 1) * col("t") > budget)
      .withColumn("first_inf",
        min(when(col("infeasible"), col("j"))).over(tot))
      .withColumn("prefix_before",
        min(when(col("j") === col("first_inf"), col("prefix") - col("t")))
          .over(tot))
    rows
      .withColumn("cap",
        when(col("first_inf").isNull, max(col("t")).over(tot))
          .otherwise(greatest(lit(0L),
            expr(s"($budget - prefix_before) div (k - first_inf + 1)"))))
      .withColumn("kept", least(col("t"), col("cap")))
      .withColumn("share_before_pm", expr("t * 1000 div total"))
      .withColumn("kept_total", sum(col("kept")).over(tot))
      .withColumn("share_after_pm",
        expr("kept * 1000 div greatest(kept_total, 1)"))
      .select(col("source"), col("t").as("tokens"), col("cap"),
        col("kept"), col("share_before_pm"), col("share_after_pm"))
  }
}
