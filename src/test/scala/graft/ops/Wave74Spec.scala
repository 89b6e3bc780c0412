package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSessionFixture

/** Wave 74: SCC coloring, invisible-char hygiene, Wilson domain gate. */
class Wave74Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  test("scc: structured graph yields block cycles, merged triples, singleton tails") {
    val n = 120L // 7 full blocks of 17 (0..118), tail = {119}
    val nodes = spark.range(n).select(col("id"))
    val edges = Graph.synthSccEdges(nodes, n)
    val got = Graph.scc(nodes, edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n)
    // back edge exists at block index 5 (u = 5*17+4 = 89 -> 55): blocks
    // 3,4,5 merge into one SCC rooted at 51; other blocks stay separate
    for (u <- 0L until 119L) {
      val blk = u / 17
      val expected = if (blk >= 3 && blk <= 5) 51L else blk * 17
      assert(got(u) == expected, s"node $u")
    }
    // tail node: singleton SCC (its min-label is 0 — outside its component)
    assert(got(119L) == 119L)
  }

  test("scc: singleton-tail forces a second FW-BW round, still exact") {
    // n = 20: one full block (0..16) + tail {17,18,19} all pointing at 0
    val n = 20L
    val nodes = spark.range(n).select(col("id"))
    val got = Graph.scc(nodes, Graph.synthSccEdges(nodes, n)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (u <- 0L until 17L) assert(got(u) == 0L)
    for (u <- 17L until 20L) assert(got(u) == u)
  }

  test("scc: distributed peeling (localCap=0) matches the driver-local Tarjan gate") {
    val n = 120L
    val nodes = spark.range(n).select(col("id"))
    val edges = Graph.synthSccEdges(nodes, n)
    val local = Graph.scc(nodes, edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Graph.scc(nodes, edges, localCap = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == local)
  }

  test("invisibleChars: planted categories count and repair exactly") {
    val df = Seq(
      (1L, "plain\u200Bsplit word and\u00A0nbsp"),
      (2L, "account balance \u202E0001\u202C USD"),
      (3L, "dangling \u2066isolate here"),
      (4L, "clean ascii text")).toDF("doc_id", "text")
    val rows = TextStats.invisibleChars(df).orderBy("doc_id").collect()
    val r1 = rows(0)
    assert(r1.getLong(1) == 1 && r1.getLong(5) == 1 && !r1.getBoolean(7))
    assert(r1.getString(8) == Dedup.md5Hex("plainsplit word and nbsp"))
    val r2 = rows(1) // RLO override + PDF pop: balanced but override → suspicious
    assert(r2.getLong(2) == 1 && r2.getLong(3) == 1 && r2.getLong(4) == 1)
    assert(r2.getBoolean(7))
    assert(r2.getString(8) == Dedup.md5Hex("account balance 0001 USD"))
    val r3 = rows(2) // unbalanced isolate push
    assert(r3.getLong(2) == 1 && r3.getLong(3) == 0 && r3.getBoolean(7))
    val r4 = rows(3)
    assert((1 to 6).forall(i => r4.getLong(i) == 0) && !r4.getBoolean(7))
    assert(r4.getString(8) == Dedup.md5Hex("clean ascii text"))
  }

  test("wilson integer decision equals the float formula on a sweep") {
    // LB(z=2) >= 1/3  <=>  A=3s-n+2 >= 0 AND A^2*n >= 36*(s*(n-s)+n)
    for (n <- 1 to 60; s <- 0 to n) {
      val p = s.toDouble / n
      val lb = (p + 2.0 / n - 2.0 * math.sqrt(p * (1 - p) / n + 1.0 / (n * n))) /
        (1.0 + 4.0 / n)
      val a = 3L * s - n + 2
      val int = a >= 0 && a * a * n >= 36L * (s.toLong * (n - s) + n)
      // guard the strict-boundary ULP zone: the two only may disagree
      // when lb is within 1e-12 of 1/3 (never hit on integer inputs)
      assert(int == (lb >= 1.0 / 3 - 1e-12), s"n=$n s=$s lb=$lb")
    }
  }
}
