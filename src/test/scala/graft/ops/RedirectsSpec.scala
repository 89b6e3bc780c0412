package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Redirect-chain resolution: pointer doubling collapses chains in
  * O(log L) rounds, cycles and ρ-tails are flagged, never looped on. */
class RedirectsSpec extends AnyFunSuite {

  lazy val spark = SparkSessionFixture.spark

  test("synth corpus: chains resolve with true hop counts, cycles flagged") {
    val (urls, edges) = Redirects.synthRedirects(spark)
    import spark.implicits._
    val out = Redirects.resolve(urls, edges)
      .as[(String, String, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out.size == 64)
    // head of a chain: 5 hops to the terminal
    assert(out("https://r.example/u0") ==
      (("https://r.example/u0", "https://r.example/u5", 5L, "resolved")))
    // mid-chain: 2 hops
    assert(out("https://r.example/u9") ==
      (("https://r.example/u9", "https://r.example/u11", 2L, "resolved")))
    // terminal url: resolves to itself with 0 hops
    assert(out("https://r.example/u5") ==
      (("https://r.example/u5", "https://r.example/u5", 0L, "resolved")))
    // pure cycle and the ρ-tail leading into it: flagged, empty target
    Seq("c0", "c1", "c2", "t0").foreach { s =>
      assert(out(s"https://r.example/$s") ==
        ((s"https://r.example/$s", "", -1L, "cycle")), s)
    }
    assert(out.values.count(_._4 == "cycle") == 4)
  }

  test("long chain collapses within the logarithmic round budget") {
    import spark.implicits._
    // one chain of length 33: needs ceil(log2 33) = 6 doubling rounds
    val edges = (0 until 33).map(i => (s"n$i", s"n${i + 1}")).toDF("src", "dst")
    val urls = (0 to 33).map(i => s"n$i").toDF("url")
    val out = Redirects.resolve(urls, edges, maxRounds = 7)
      .as[(String, String, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out("n0") == (("n0", "n33", 33L, "resolved")))
    assert(out("n33") == (("n33", "n33", 0L, "resolved")))
    assert(out.values.forall(_._4 == "resolved"))
  }

  test("cycle-only input exits on the plateau, not the round cap") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val urls = Seq("a", "b", "z").toDF("url")
    val t0 = System.nanoTime()
    val out = Redirects.resolve(urls, edges, maxRounds = 1000)
      .as[(String, String, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out("a")._4 == "cycle" && out("b")._4 == "cycle")
    assert(out("z") == (("z", "z", 0L, "resolved")))
    // 1000 rounds would take minutes; the plateau exit makes this instant
    assert((System.nanoTime() - t0) < 120e9)
  }
}
