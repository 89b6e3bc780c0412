package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSessionFixture

/** Wave 50: hash-sample quantiles, k-core peeling, dehyphenation repair,
  * code-vs-prose detection. */
class Wave50Spec extends AnyFunSuite {

  lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  // ---- quantileByHashSample -----------------------------------------

  private def lenTable(n: Int) =
    (0 until n).map(i => ("en", i.toLong, (i % 997).toLong + 1))
      .toDF("key", "item", "v")

  test("quantile sketch: estimates land within Bernoulli rank error of exact") {
    val rs = Sketches.quantileByHashSample(lenTable(4000)).collect()
    assert(rs.length == 1)
    val r = rs.head
    val n = r.getAs[Long]("n_rows")
    val sn = r.getAs[Long]("sample_n")
    assert(n == 4000)
    // 1-in-8 hash sample: expect ~500, allow wide slack
    assert(sn > 300 && sn < 700, s"sample_n=$sn")
    // rank error of a p-quantile from an n/8 sample: a few percent of the
    // value range here (values uniform 1..997)
    for ((est, exact) <- Seq("p50" -> 500, "p90" -> 900, "p99" -> 990)) {
      val e = r.getAs[Long](s"${est}_est").toDouble
      val x = r.getAs[Long](s"${est}_exact").toDouble
      assert(math.abs(e - x) < 80, s"$est est=$e exact=$x")
      val _ = exact
    }
  }

  test("quantile sketch: partition-invariant (same bits on any layout)") {
    val t = lenTable(1000)
    val a = Sketches.quantileByHashSample(t.repartition(1)).collect().head.toSeq
    val b = Sketches.quantileByHashSample(t.repartition(13)).collect().head.toSeq
    assert(a == b)
  }

  test("quantile sketch: tiny key with empty sample yields null estimates, exact survives") {
    // one row: sampled only if md5('qs:900001') % 2^20 < 2^17 (1-in-8); use
    // several singleton keys so at least one lands unsampled
    val t = (0 until 12).map(i => (s"k$i", 900001L + i, 42L)).toDF("key", "item", "v")
    val rs = Sketches.quantileByHashSample(t).collect()
    assert(rs.length == 12)
    val unsampled = rs.filter(_.getAs[Long]("sample_n") == 0L)
    assert(unsampled.nonEmpty, "expected at least one unsampled singleton")
    unsampled.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("p50_est")))
      assert(r.getAs[Long]("p50_exact") == 42L)
    }
  }

  // ---- kCore ---------------------------------------------------------

  /** 4-clique (ids 0-3) + pendant chain 3-4-5-6 hanging off the clique. */
  private def cliqueChain = {
    val cl = for (i <- 0 to 3; j <- 0 to 3 if i != j) yield (i.toLong, j.toLong)
    val chain = Seq((3L, 4L), (4L, 5L), (5L, 6L))
    (cl ++ chain).toDF("src", "dst")
  }

  test("kcore: clique survives k=3, pendant chain peels off") {
    val nodes = (0L to 6L).toDF("id")
    val rs = Graph.kCore(nodes, cliqueChain, k = 3).collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("degree"), r.getAs[Long]("core_degree"), r.getAs[Boolean]("in_kcore")))).toMap
    for (i <- 0L to 2L) assert(rs(i) == ((3L, 3L, true)), s"clique node $i")
    assert(rs(3L) == ((4L, 3L, true)), "bridge node keeps clique edges only")
    for (i <- 4L to 6L) assert(rs(i)._3 == false, s"chain node $i peeled")
    assert(rs(6L)._1 == 1L && rs(6L)._2 == 0L)
  }

  test("kcore: a cycle is a 2-core but peels fully at k=3") {
    val nodes = (0L to 5L).toDF("id")
    val cyc = (0 to 5).map(i => (i.toLong, ((i + 1) % 6).toLong)).toDF("src", "dst")
    val k2 = Graph.kCore(nodes, cyc, k = 2).collect()
    assert(k2.forall(_.getAs[Boolean]("in_kcore")), "cycle survives k=2 intact")
    val k3 = Graph.kCore(nodes, cyc, k = 3).collect()
    assert(k3.forall(!_.getAs[Boolean]("in_kcore")), "cycle has no 3-core")
    assert(k3.forall(_.getAs[Long]("core_degree") == 0L))
  }

  test("kcore: maxRounds too small throws instead of returning a non-fixpoint") {
    // cascading peel: a path hanging off a triangle loses ONE node per
    // round at k=2 (each removal exposes the next endpoint), so 8 path
    // nodes need 8+1 rounds to reach fixpoint
    val tri = Seq((0L, 1L), (1L, 2L), (2L, 0L))
    val path = (0 until 8).map(i => (2L + i, 3L + i))
    val edges = (tri ++ path).toDF("src", "dst")
    val nodes = (0L to 10L).toDF("id")
    val e = intercept[IllegalArgumentException] {
      Graph.kCore(nodes, edges, k = 2, maxRounds = 3).collect()
    }
    assert(e.getMessage.contains("no fixpoint"))
    // and a sufficient budget converges: only the triangle survives
    val ok = Graph.kCore(nodes, edges, k = 2, maxRounds = 20).collect()
    assert(ok.count(_.getAs[Boolean]("in_kcore")) == 3)
  }

  // ---- dehyphenateAudit ----------------------------------------------

  test("dehyphenate: planted soft breaks heal to the exact original") {
    val docs = Seq(
      (0L, "the merge batch runs a fast scan over the table"),
      (1L, "a b cd efg"), // all words < 5 letters: nothing to break
      (2L, "windowed aggregation pipelines stream")
    ).toDF("doc_id", "text")
    val rs = TextStats.dehyphenateAudit(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rs.values.forall(_.getAs[Boolean]("restored")))
    rs.values.foreach(r =>
      assert(r.getAs[Long]("n_breaks") == r.getAs[Long]("n_repairs")))
    // doc 0: words >= 5 letters followed by space: merge, batch, (runs=4 no),
    // (fast=4 no), table is last word (no trailing space) -> 2 breaks
    assert(rs(0L).getAs[Long]("n_breaks") == 2L)
    assert(rs(1L).getAs[Long]("n_breaks") == 0L)
    // doc 2: windowed, aggregation, pipelines break; stream is last -> 3
    assert(rs(2L).getAs[Long]("n_breaks") == 3L)
  }

  test("dehyphenate: real hyphens without a newline are left alone") {
    val healed = Seq(Tuple1("state-of-the-art co-op rock-\nsolid"))
      .toDF("text").select(TextStats.dehyphenateCol(col("text")).as("t"))
      .collect().head.getString(0)
    assert(healed == "state-of-the-art co-op rocksolid")
  }

  // ---- codeDetect ----------------------------------------------------

  test("code detect: planted code blocks flag, natural prose scores zero") {
    val docs = Seq(
      (0L, "the fast scan merges the table rows"),     // residue 0: JS block
      (1L, "a window sort orders the batch"),          // clean
      (2L, "hash joins group the key values"),         // residue 2: py block
      (3L, "slow streams spill to the sort"),
      (4L, "vector parts filter the query")
    ).toDF("doc_id", "text")
    val rs = TextStats.codeDetect(TextStats.corpusWithCodeBlocks(docs))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rs(0L).getAs[Boolean]("is_code"))
    assert(rs(2L).getAs[Boolean]("is_code"))
    Seq(1L, 3L, 4L).foreach { i =>
      assert(!rs(i).getAs[Boolean]("is_code"))
      assert(rs(i).getAs[Long]("score") == 0L, s"natural doc $i scores 0")
    }
    // JS block: 4 braces, 3 semicolons, keywords function/return/var
    assert(rs(0L).getAs[Long]("n_braces") == 4L)
    assert(rs(0L).getAs[Long]("n_semis") == 3L)
    assert(rs(0L).getAs[Long]("kw_hits") == 3L)
    // Py/C block: 2 braces, 4 semicolons, import/def/return/class/int
    assert(rs(2L).getAs[Long]("n_braces") == 2L)
    assert(rs(2L).getAs[Long]("n_semis") == 4L)
    assert(rs(2L).getAs[Long]("kw_hits") == 5L)
  }
}
