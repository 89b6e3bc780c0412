package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus lexicon statistics — the three numbers a tokenizer/index team
  * asks of a new crawl before anything trains on it: does the term
  * distribution look like language (Zipf), how fast does vocabulary grow
  * as the corpus grows (Heaps), and what does the inverted index cost to
  * store (delta+varint postings). All outputs are integer-exact permille
  * arithmetic the DuckDB oracle replays bit-for-bit; every operator is
  * one token-count shuffle plus vocab-sized follow-ups — the same scale
  * discipline as [[TextStats.rarity]].
  *
  * Tokenization contract matches the rest of the repo (split on single
  * spaces, drop empties) so cross-operator joins stay consistent. */
object Lexicon {

  /** The ranks at which [[zipf]] probes rank×frequency stability. */
  val ZipfRanks: Seq[Int] = Seq(1, 2, 5, 10, 20, 50, 100)

  /** One-row Zipf's-law audit: for a perfectly Zipfian corpus (s=1),
    * rank×frequency is constant, so `rxf_pm_r` = r·f(r)·1000/f(1) stays
    * near 1000 across ranks; natural text decays slowly, boilerplate- or
    * template-dominated corpora collapse fast. Integer-exact — no log
    * fitting, so no float divergence between engines. Ranks beyond the
    * vocabulary report -1.
    *
    * Shape: ONE map-side-combined term-count shuffle; totals aggregate
    * the vocab-sized count table; the rank probe is TakeOrdered(100)
    * (never a full sort), and the 100-row tail folds on the driver. */
  def zipf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val cnt = docs
      .select(explode(split(col("text"), " ")).as("t"))
      .where(col("t") =!= "")
      .groupBy("t").agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // vocab-sized; feeds totals AND the top-k probe
    val tot = cnt.agg(count(lit(1)).as("n_types"), sum(col("c")).as("n_tokens"))
      .collect()(0)
    val top = cnt.orderBy(col("c").desc, col("t")).limit(ZipfRanks.max)
      .select(col("c")).as[Long].collect() // TakeOrderedAndProject, ≤100 rows
    cnt.unpersist()
    val c1 = if (top.nonEmpty) top(0) else 1L
    val probes = ZipfRanks.map { r =>
      if (r <= top.length) r.toLong * top(r - 1) * 1000L / c1 else -1L
    }
    Seq((tot.getLong(0), tot.getLong(1), c1) -> probes).map { case ((a, b, c), p) =>
      (a, b, c, p(0), p(1), p(2), p(3), p(4), p(5), p(6))
    }.toDF("n_types", "n_tokens", "top1_cnt",
      "rxf_pm_1", "rxf_pm_2", "rxf_pm_5", "rxf_pm_10",
      "rxf_pm_20", "rxf_pm_50", "rxf_pm_100")
  }

  /** Heaps'-law vocabulary-growth curve over id-space deciles: per decile
    * d, the cumulative doc/token counts and the cumulative vocabulary —
    * terms attributed to the decile of their FIRST occurrence (min doc_id),
    * so the curve needs no sequential scan: one term-keyed min() shuffle
    * replaces the textbook "replay the corpus in order". `ttr_pm` is the
    * cumulative type/token ratio ×1000. Deciles partition the doc_id VALUE
    * space (d = id·10 div (max_id+1)): exact for the contiguous ids the
    * corpus carries, and monotone for any id scheme.
    *
    * A flattening vocab_cum across deciles is the healthy Heaps shape;
    * linear growth flags an id-correlated vocabulary shift (e.g. a new
    * source appended at high ids). */
  def heaps(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"))
    val nMax = base.agg(max(col("doc_id"))).collect()(0).getLong(0) + 1L
    val bucket = expr(s"CAST(doc_id * 10 div $nMax AS BIGINT)")
    val perDoc = base.select(bucket.as("b"),
      size(filter(split(col("text"), " "), x => x =!= "")).cast("long").as("n_tok"))
      .groupBy("b").agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_toks"))
    val firstSeen = base
      .select(bucket.as("b"), explode(split(col("text"), " ")).as("t"))
      .where(col("t") =!= "")
      .groupBy("t").agg(min(col("b")).as("fb"))
      .groupBy(col("fb").as("b")).agg(count(lit(1)).as("n_new"))
    val w = Window.orderBy("decile") // 10-row table: the global window is free
    perDoc.join(firstSeen, Seq("b"), "left")
      .select(col("b").as("decile"), col("n_docs"), col("n_toks"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
      .select(col("decile"),
        sum(col("n_docs")).over(w).as("docs_cum"),
        sum(col("n_toks")).over(w).as("tokens_cum"),
        sum(col("n_new")).over(w).as("vocab_cum"))
      .select(col("decile"), col("docs_cum"), col("tokens_cum"), col("vocab_cum"),
        expr("CASE WHEN tokens_cum = 0 THEN -1 ELSE vocab_cum * 1000 div tokens_cum END")
          .as("ttr_pm"))
  }

  /** Distinct-n diversity (Li et al. 2016, NAACL — the standard
    * generation/corpus diversity metric): per (lang, n) the total and
    * distinct n-gram counts and their permille ratio. A collapsing
    * distinct-2/3 flags template- or dedup-starved corpora long before a
    * human reads a sample; per-language rows expose the low-resource tail
    * where diversity collapses first.
    *
    * Shape: one in-row gram expansion per n (guarded so short docs emit
    * nothing — never a descending `sequence`), then ONE gram-keyed
    * map-side-combined shuffle per (lang, n); the distinct/total rollup
    * aggregates the gram-count table, vocab-sized not corpus-sized. */
  def distinctN(docs: DataFrame, ns: Seq[Int] = Seq(1, 2, 3)): DataFrame = {
    val toks = filter(split(col("text"), " "), x => x =!= "")
    val perN = ns.map { n =>
      docs.select(col("lang"), toks.as("t"))
        .select(col("lang"), lit(n).as("n"),
          explode(when(size(col("t")) >= n,
            transform(sequence(lit(1), size(col("t")) - (n - 1)),
              i => concat_ws(" ", slice(col("t"), i, lit(n)))))
            .otherwise(array().cast("array<string>"))).as("gram"))
    }.reduce(_ unionByName _)
    perN.groupBy(col("lang"), col("n"), col("gram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("lang"), col("n"))
      .agg(sum(col("c")).as("total_grams"), count(lit(1)).as("distinct_grams"))
      .select(col("lang"), col("n"), col("total_grams"), col("distinct_grams"),
        expr("distinct_grams * 1000 div total_grams").as("distinct_pm"))
  }

  /** Inverted-index storage accounting under the standard delta + LEB128
    * varint postings encoding: per term the sorted distinct doc_id list
    * becomes gaps (first entry stored as doc_id+1 so every value ≥ 1),
    * each gap costs ceil(bitwidth/7) bytes. One row out: term/posting
    * counts, raw int64 bytes, varint bytes, and the saving ×1000.
    *
    * Shape: distinct (term, doc) is one shuffle; the per-term lag window
    * reuses that hash partitioning (no second exchange); the final
    * aggregate is a map-side-combined 1-row rollup. The decile/term
    * tables never carry text past the first projection. */
  def varintIndex(docs: DataFrame): DataFrame = {
    val post = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .where(col("t") =!= "")
      .distinct()
    val w = Window.partitionBy("t").orderBy("doc_id")
    val gaps = post.select(col("t"),
      coalesce(col("doc_id") - lag("doc_id", 1).over(w), col("doc_id") + 1L)
        .as("gap"))
    gaps.select(col("t"),
        expr("CAST((length(bin(gap)) + 6) div 7 AS BIGINT)").as("vbytes"))
      .agg(countDistinct(col("t")).as("n_terms"),
        count(lit(1)).as("n_postings"),
        sum(col("vbytes")).as("varint_bytes"))
      .select(col("n_terms"), col("n_postings"),
        (col("n_postings") * 8L).as("raw_bytes"),
        col("varint_bytes"),
        expr("(n_postings * 8 - varint_bytes) * 1000 div (n_postings * 8)")
          .as("saving_pm"))
  }
}
