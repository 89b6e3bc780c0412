package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-domain mirror detection — the anti-over-representation signal:
  * CDN copies, scraper mirrors, and multi-TLD deployments put the same
  * bytes under many hosts, and a per-url dedup pass keeps every copy. The
  * detector works on (domain, content-digest) pairs — never payloads —
  * and reports domain pairs that share enough digests to be mirrors. */
object Mirrors {

  /** Deterministic mirrored-corpus synthesis: every doc_id % 5 == 0 page
    * also appears under a cdn{0,1,2}.net host with an identical digest
    * (the corpus has no natural cross-site duplicates). Mirrored verbatim
    * in the DuckDB oracle. Input: normalized (doc_id, domain) ⋈ documents
    * text. Output rows: (domain, digest). */
  def synthMirrored(normalized: DataFrame, docsText: DataFrame): DataFrame = {
    val base = normalized.select(col("doc_id"), col("domain"))
      .join(docsText.select(col("doc_id"), md5(col("text")).as("digest")), "doc_id")
    base.select(col("domain"), col("digest"))
      .unionAll(base.where(col("doc_id") % 5 === 0)
        .select(concat(lit("cdn"), col("doc_id") % 3, lit(".net")).as("domain"),
          col("digest")))
  }

  /** Domain pairs sharing ≥ `minShared` distinct content digests, with an
    * integer containment score n_shared·1000 div min(|A|,|B|) (1000 = the
    * smaller domain is entirely contained in the larger — a pure mirror).
    *
    * Scale shape: everything is (domain, digest) — 16-byte-ish rows, no
    * payloads. Digests shared by > `maxPerDigest` domains are dropped
    * before the self-join (boilerplate digests — empty pages, error
    * pages — would otherwise go quadratic), the same salt-cap discipline
    * as the LSH band joins; within the cap the self-join on digest is a
    * sort-merge join whose output is bounded by cap²/2 per digest. The
    * pair rollup and the per-domain size rollup are both algebraic
    * (map-side combined). */
  def domainPairs(pages: DataFrame, maxPerDigest: Int = 16,
                  minShared: Long = 2L): DataFrame = {
    // (domain, digest) distinct is read FIVE times downstream (cap filter,
    // both self-join sides, size rollup) — materialize once or the whole
    // upstream (url synthesis + md5) re-evaluates per read
    val dd = pages.select(col("domain"), col("digest")).distinct()
      .localCheckpoint(true)
    val keptDigests = dd.groupBy("digest").agg(count(lit(1)).as("nd"))
      .where(col("nd") >= 2 && col("nd") <= maxPerDigest)
      .select(col("digest"))
    val kept = dd.join(keptDigests, "digest")
    val pairs = kept.as("x").join(kept.as("y"),
        col("x.digest") === col("y.digest") && col("x.domain") < col("y.domain"))
      .groupBy(col("x.domain").as("domain_a"), col("y.domain").as("domain_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
    val sizes = dd.groupBy("domain").agg(count(lit(1)).as("n"))
    pairs
      .join(sizes.select(col("domain").as("domain_a"), col("n").as("na")), "domain_a")
      .join(sizes.select(col("domain").as("domain_b"), col("n").as("nb")), "domain_b")
      .select(col("domain_a"), col("domain_b"), col("n_shared"),
        expr("n_shared * 1000 div least(na, nb)").as("containment_permille"))
  }
}
