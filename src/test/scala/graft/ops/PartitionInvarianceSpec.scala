package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Systematic determinism audit: every operator in the repo claims
  * bit-reproducibility on any partitioning (integer arithmetic, packed
  * argmins, order-independent aggregates). This spec TESTS that claim
  * across a representative shuffle-heavy subset of `SparkEntry.queries`:
  * each query runs twice against the same sf0.001 tables — once on the
  * shared fixture session (shuffle.partitions=8, AQE on) and once on a
  * sibling session with shuffle.partitions=3 and AQE OFF — and the two
  * canonicalized result sets must be IDENTICAL. A task-retry or
  * speculative re-execution at 100 TB replays exactly this perturbation,
  * so any mismatch here is a silent-corruption bug at scale.
  *
  * Subset choice: at least one query per family whose plan contains a
  * real exchange (dedup bands, graph iterations, sketches, windows,
  * retrieval, clustering, sampling); purely per-row projections are
  * trivially invariant and are left to their own specs. */
class PartitionInvarianceSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  private val names = Seq(
    "q1_agg", "q_join_revenue", "q_topk_global", "q_window_topk",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash", "dedup_clusters",
    "dedup_jaccard_block", "dedup_paragraph", "dedup_substring_spans",
    "dedup_cdc", "dedup_keeper",
    "ann_cosine_topk", "ann_ivf_topk", "ann_lsh_topk", "ann_pq_adc",
    "embedding_pq", "dedup_semantic", "decontaminate_semantic",
    "graph_scc", "graph_kcore", "graph_coreness", "graph_triangles",
    "graph_hyperball", "quality_uncertainty_sample",
    "graph_bowtie", "domain_rank", "domain_trustrank",
    "sketch_hll", "sketch_kmv", "sketch_quantile", "sketch_bloom",
    "heavy_hitters",
    "text_bm25", "retrieval_ndcg", "retrieval_hard_negatives",
    "retrieval_mrr", "corpus_distinct_n", "graph_communities",
    "text_tfidf_terms", "text_index",
    "text_winnow", "text_rarity", "corpus_ngrams", "corpus_zipf",
    "corpus_heaps", "index_varint_size",
    "events_sessionize", "events_funnel", "events_retention", "events_cuped",
    "events_did", "events_srm", "corpus_shuffle", "events_power",
    "graph_smooth", "events_markov_attrib", "events_ltv", "retrieval_rrf",
    "text_keywords", "events_paths", "quality_roc", "corpus_dup_quality",
    "dedup_lsh_tune", "events_anomaly_mad", "graph_degree_hist",
    "events_uplift", "quality_label_noise", "events_sequential",
    "events_time_to_convert", "tok_coverage", "graph_clustering", "text_langid_eval", "events_rfm", "text_boilerplate_prefix",
    "text_ngram_novelty", "text_contamination_spans", "emb_effective_rank",
    "ann_filtered_topk", "text_continuation_pairs", "corpus_snapshot_drift",
    "dedup_boilerplate_masked",
    "url_dedup", "url_domain_stats", "mirror_domains", "redirect_resolve",
    "sample_priority", "sample_quota", "split_holdout", "corpus_pack",
    "quality_dsir", "quality_perceptron", "quality_calibration",
    "events_ctr_smoothing",
    // waves 115-128: every new shuffle-carrying operator
    "text_collocations", "dedup_titles", "events_survival", "events_scd2",
    "emb_jl_audit", "er_customers", "corpus_bootstrap",
    "privacy_k_anonymity", "privacy_release_gate", "gate_cascade_plan",
    "shard_balance", "gate_shapley", "text_burstiness",
    "range_bucket_join", "join_skew_estimate", "stats_ks_test",
    "source_length_quantiles", "ivm_merge_audit", "truncation_curve",
    "feature_hash_audit", "hamilton_allocation", "train_interleave",
    "quality_rank_blend", "mixture_waterfill", "emb_centroid_confusion",
    "emb_kcenter", "dedup_venn",
    "crawl_novelty_forecast", "events_croston", "dedup_threshold_curve",
    "conformal_length_bounds")

  /** Canonical dump: JSON rows sorted — order- and layout-free. */
  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.toJSON.collect().toSeq.sorted

  test("shuffle-heavy queries are bit-identical at 3-wide AQE-off vs 8-wide AQE-on") {
    val base = SparkSessionFixture.spark
    val alt = base.newSession()
    alt.conf.set("spark.sql.shuffle.partitions", "3")
    alt.conf.set("spark.sql.adaptive.enabled", "false")
    val queries = graft.SparkEntry.queries
    val missing = names.filterNot(queries.contains)
    assert(missing.isEmpty, s"unknown query names in subset: $missing")
    val diffs = names.flatMap { n =>
      val a = canon(queries(n)(base, sf))
      val b = canon(queries(n)(alt, sf))
      if (a == b) None
      else Some(s"$n: ${a.length} vs ${b.length} rows; first diff: " +
        a.zipAll(b, "<missing>", "<missing>").find { case (x, y) => x != y }
          .map { case (x, y) => s"\n  8-wide: $x\n  3-wide: $y" }.getOrElse(""))
    }
    assert(diffs.isEmpty, diffs.mkString("\n"))
  }
}
