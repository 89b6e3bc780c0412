package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSessionFixture

/** Hand-checked semantics for chunking, packing, and URL rule filtering. */
class AssembleSpec extends AnyFunSuite {

  lazy val spark = SparkSessionFixture.spark

  test("chunk: window/stride boundaries, short tail, single-chunk doc, empty doc dropped") {
    import spark.implicits._
    // doc 1: 10 tokens, window 4 stride 3 → chunks at 0,3,6 and tail at 9
    //   n=10 → nChunks = 1 + ceil((10-4)/3) = 1 + 2 = 3  → offsets 0,3,6
    //   (offset 6 covers tokens 7..10, so token 10 is included — no 4th chunk)
    val d = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),
      (2L, "a b"),        // n <= window → exactly one chunk
      (3L, "   "),        // no tokens → dropped
      (4L, "x  y   z")    // multi-space separators collapse
    ).toDF("doc_id", "text")
    val r = Assemble.chunk(d, window = 4, stride = 3)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(r == Seq(
      (1L, 0L, 4L, "t1 t2 t3 t4"),
      (1L, 1L, 4L, "t4 t5 t6 t7"),
      (1L, 2L, 4L, "t7 t8 t9 t10"),
      (2L, 0L, 2L, "a b"),
      (4L, 0L, 3L, "x y z")))
    // every token of doc 1 appears in some chunk (full coverage)
    val covered = r.filter(_._1 == 1L).flatMap(_._4.split(" ")).toSet
    assert(covered == (1 to 10).map(i => s"t$i").toSet)
  }

  test("chunk plan: narrow Generate over the scan, zero Exchange") {
    import spark.implicits._
    val d = (0L until 50L).map(i => (i, Seq.fill(40)("w").mkString(" "))).toDF("doc_id", "text")
    val plan = Assemble.chunk(d, 8, 6).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(400))
    assert(plan.contains("Generate"), plan.take(400))
  }

  test("pack: sequential fill per shard, straddling doc keeps its start bin") {
    import spark.implicits._
    // force one shard so the fill order is fully specified by doc_id
    val d = Seq(
      (1L, Seq.fill(100)("w").mkString(" ")),  // off 0   → bin 0
      (2L, Seq.fill(100)("w").mkString(" ")),  // off 100 → bin 0
      (3L, Seq.fill(100)("w").mkString(" ")),  // off 200 → bin 0 (straddles 256)
      (4L, Seq.fill(50)("w").mkString(" ")),   // off 300 → bin 1
      (5L, "")                                  // 0 tokens → dropped
    ).toDF("doc_id", "text")
    val r = Assemble.pack(d, seqLen = 256, nShards = 1)
      .orderBy("bin_id")
      .select("bin_id", "n_docs", "n_tokens", "first_doc", "last_doc")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((0L, 3L, 300L, 1L, 3L), (1L, 1L, 50L, 4L, 4L)))
  }

  test("pack: one data Exchange (the shard window); bin agg reuses the partitioning") {
    import spark.implicits._
    val d = (0L until 200L).map(i => (i, Seq.fill(20)("w").mkString(" "))).toDF("doc_id", "text")
    val packed = Assemble.pack(d, seqLen = 64, nShards = 8)
    val plan = packed.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan.take(600))
    // shards are deterministic: identical totals across runs
    val t1 = packed.agg(sum("n_tokens")).as[Long].head()
    assert(t1 == 200L * 20L)
  }

  test("url filter: rule precedence domain > path > extension; kept rows blank") {
    import spark.implicits._
    val rows = Seq(
      (1L, "https://spam.example.com/p/7/x.jpg", "spam.example.com", "example.com"),
      (2L, "https://ok.org/p/7?a=1", "ok.org", "ok.org"),
      (3L, "https://ok.org/img/pic.jpg", "ok.org", "ok.org"),
      (4L, "https://ok.org/about", "ok.org", "ok.org"),
      (5L, "https://ok.org/a?x=/p/7", "ok.org", "ok.org") // /p/7 only in QUERY → kept
    ).toDF("doc_id", "url_canon", "host", "domain")
    val r = UrlOps.filterByRules(rows,
        blockedDomains = Seq("example.com"),
        blockedPathParts = Seq("/p/7"),
        blockedExtensions = Seq("jpg"))
      .orderBy("doc_id").select("doc_id", "rule", "blocked")
      .as[(Long, String, Boolean)].collect().toSeq
    assert(r == Seq(
      (1L, "domain", true),   // domain wins over path+extension
      (2L, "path", true),
      (3L, "extension", true),
      (4L, "", false),
      (5L, "", false)))
    // zero shuffle: pure projection
    val plan = UrlOps.filterByRules(rows, Seq("example.com"), Seq("/p/7"), Seq("jpg"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(400))
  }
}
