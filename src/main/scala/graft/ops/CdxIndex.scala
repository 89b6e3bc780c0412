package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDX-style capture index over crawl captures — the URL-index artifact
  * Common-Crawl-shaped archives publish next to the WARCs (the cdxj index
  * wayback machines and dedup-at-fetch crawlers query). Two pieces:
  *
  *  - SURT keys (Sort-friendly URI Reordering Transform): the canonical
  *    url rewritten host-reversed — `https://a.example.com:8080/p?q` →
  *    `com,example,a:8080)/p?q` — so a lexicographic sort co-locates a
  *    registered domain's entire subtree. At 10^12 rows that property IS
  *    the design: range-partitioning the index by SURT key gives every
  *    domain a contiguous key range (domain-scoped lookups touch one
  *    partition range instead of broadcasting a predicate to all of them).
  *
  *  - The capture rollup: one row per SURT key with capture count,
  *    distinct-content count, first/latest timestamps and the latest
  *    digest. Every aggregate is algebraic (count / min / max / max_by),
  *    so hot urls (a homepage captured millions of times) combine
  *    map-side before the single Exchange — per-key state is a handful of
  *    scalars, never a capture list.
  *
  * Semantics are engine-portable string/arith ops only; the DuckDB oracle
  * replays key construction and rollup bit-for-bit.
  */
object CdxIndex {

  /** SURT key of an ALREADY-CANONICAL url (UrlOps.canonicalizeUrl output:
    * lowercase scheme/host, default ports dropped, path defaulted to '/',
    * query sorted, fragment gone). Pure codegen'd built-ins. */
  def surtKey(canon: Column): Column = {
    val rest = regexp_replace(canon, "^[a-z][a-z0-9+.-]*://", "")
    val hostport = regexp_extract(rest, "^[^/]*", 0)
    val pathq = rest.substr(length(hostport) + lit(1), length(rest))
    val host = regexp_replace(hostport, ":[0-9]+$", "")
    val port = regexp_extract(hostport, "(:[0-9]+)$", 1)
    concat(array_join(reverse(split(host, "\\.")), ","), port, lit(")"), pathq)
  }

  /** Deterministic multi-capture synthesis keyed on doc_id (the corpus is
    * single-snapshot, so tests and oracles plant a capture history):
    * 1 + doc_id%3 captures per doc at unique timestamps, content digest
    * changing every second capture. Canonical-url collisions (planted by
    * UrlOps.withRawUrls) land captures from different docs on the same
    * SURT key, so the rollup has real multi-source groups. Mirrored
    * verbatim in the DuckDB oracle. */
  def synthCaptures(normalized: DataFrame): DataFrame =
    normalized.select(col("doc_id"), col("url_canon"))
      .withColumn("i", explode(sequence(lit(0), (col("doc_id") % 3).cast("int"))))
      .select(
        col("url_canon"),
        (col("doc_id") * 100 + col("i") * 7).cast("long").as("warc_ts"),
        md5(concat(col("url_canon"), lit("#"),
          floor(col("i") / 2).cast("long"))).as("digest"))

  /** The index build: group captures by SURT key, algebraic rollup only.
    * Input schema: (url_canon, warc_ts: long, digest: string); timestamps
    * are unique per key (true of real CDX inputs at capture granularity),
    * making max_by deterministic. */
  def build(captures: DataFrame): DataFrame =
    captures.withColumn("surt", surtKey(col("url_canon")))
      .groupBy("surt")
      .agg(
        count(lit(1)).as("n_captures"),
        countDistinct(col("digest")).as("n_digests"),
        min(col("warc_ts")).as("first_ts"),
        max(col("warc_ts")).as("latest_ts"),
        max_by(col("digest"), col("warc_ts")).as("latest_digest"))
}
