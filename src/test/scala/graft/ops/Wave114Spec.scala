package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 114: boilerplate-masked dedup — site chrome hides cross-site
  * mirrors from exact hashing until the per-site LCP strip. */
class Wave114Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  test("maskedDedupStats: chrome-masked mirrors surface only after the strip") {
    import spark.implicits._
    val corpus = Seq(
      (0L, 0L, "AAA | X body"), (1L, 0L, "AAA | Y body"),
      (2L, 1L, "BBB | X body"), (3L, 1L, "BBB | Y body"))
      .toDF("doc_id", "site", "text")
    val out = TextStats.maskedDedupStats(corpus).orderBy("phase").collect()
    // after: strip "AAA | "/"BBB | " → {X body, Y body} ×2 → 2 groups of 2
    assert(out(0).getString(0) == "after")
    assert((out(0).getAs[Long]("n_groups"), out(0).getAs[Long]("n_dup_docs"),
      out(0).getAs[Long]("dup_pairs")) == (2L, 4L, 2L))
    // before: all four texts distinct
    assert(out(1).getString(0) == "before")
    assert((out(1).getAs[Long]("n_groups"), out(1).getAs[Long]("n_dup_docs"),
      out(1).getAs[Long]("dup_pairs")) == (4L, 0L, 0L))
  }

  test("maskedDedupStats: single-doc sites never strip to empty (no spurious dup group)") {
    import spark.implicits._
    val corpus = Seq(
      (0L, 0L, "only doc on site zero"),
      (1L, 1L, "only doc on site one"))
      .toDF("doc_id", "site", "text")
    val out = TextStats.maskedDedupStats(corpus).orderBy("phase").collect()
    assert(out.forall(_.getAs[Long]("dup_pairs") == 0L))
    assert(out.forall(_.getAs[Long]("n_groups") == 2L))
  }

  test("corpusWithMirroredBodies: LCP stops at the header; groups of exactly `sites` emerge") {
    import spark.implicits._
    val docs = (0L until 10L).map(i => (i, "unused")).toDF("doc_id", "text")
    val corpus = TextStats.corpusWithMirroredBodies(docs, sites = 5)
    // header is 23 chars; k-letter cycling guarantees the LCP stops there
    val lcp = TextStats.boilerplatePrefix(corpus).collect()
    assert(lcp.forall(_.getAs[Long]("lcp_len") == 23L))
    val out = TextStats.maskedDedupStats(corpus).orderBy("phase").collect()
    assert((out(0).getAs[Long]("n_groups"), out(0).getAs[Long]("dup_pairs")) == (2L, 20L))
    assert((out(1).getAs[Long]("n_groups"), out(1).getAs[Long]("dup_pairs")) == (10L, 0L))
  }
}
