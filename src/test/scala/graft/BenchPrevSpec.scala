package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench.extractPrevNormalized against the REAL committed round
  * artifacts (ADVICE r4 #1: the old regex could never match the driver's
  * escaped-tail wrappers, silently defeating the regression gate).
  */
class BenchPrevSpec extends AnyFunSuite {

  private def readIfExists(p: String): Option[String] = {
    val f = new java.io.File(p)
    if (f.isFile) Some(new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")) else None
  }

  test("unescapes a driver-style wrapped tail and extracts the map") {
    // same shape as the driver wrapper: bench JSON escaped inside "tail"
    val inner = """{"metric":"total","sf":"/root/testdata/sf0.1","queries_normalized":{"q1":0.120,"q2":3.400},"scaling_efficiency":0.85}"""
    val wrapped = s"""{"n": 4, "rc": 0, "tail": "${inner.replace("\"", "\\\"")}\\n", "parsed": null}"""
    val m = Bench.extractPrevNormalized(wrapped, "/root/testdata/sf0.1")
    assert(m == Map("q1" -> 0.12, "q2" -> 3.4))
  }

  test("sf mismatch yields empty (no cross-SF regression comparisons)") {
    val inner = """{"sf":"/root/testdata/sf0.1","queries_normalized":{"q1":0.120}}"""
    val wrapped = s"""{"tail": "${inner.replace("\"", "\\\"")}"}"""
    assert(Bench.extractPrevNormalized(wrapped, "/root/testdata/sf0.01").isEmpty)
  }

  test("real BENCH_LOCAL.json (unwrapped full line) parses to the full query map") {
    readIfExists("BENCH_LOCAL.json").foreach { txt =>
      // artifact records its own sf; extract it and ask for that one
      val sf = """"sf":"([^"]+)"""".r.findFirstMatchIn(txt).map(_.group(1))
      assert(sf.isDefined, "BENCH_LOCAL.json should carry a string sf field")
      val m = Bench.extractPrevNormalized(txt, sf.get)
      assert(m.size >= 50, s"expected the full per-query map, got ${m.size}")
      assert(m.values.forall(v => v > 0 && v < 1e4))
    }
  }

  test("extractPrevQueriesRaw: picks the raw queries map, not _normalized") {
    val inner = """{"sf":"/root/testdata/sf0.1","queries":{"q1":1.500,"q2":0.250},"queries_normalized":{"q1":0.120,"q2":3.400},"bw_probe_sec":0.044}"""
    val wrapped = s"""{"tail": "${inner.replace("\"", "\\\"")}"}"""
    assert(Bench.extractPrevQueriesRaw(wrapped, "/root/testdata/sf0.1") ==
      Map("q1" -> 1.5, "q2" -> 0.25))
    assert(Bench.extractPrevBwProbe(wrapped, "/root/testdata/sf0.1")
      .contains(0.044))
    assert(Bench.extractPrevBwProbe(wrapped, "/root/testdata/sf0.01").isEmpty)
  }

  test("real BENCH_LOCAL.json exposes raw seconds and a bw probe") {
    readIfExists("BENCH_LOCAL.json").foreach { txt =>
      val sf = """"sf":"([^"]+)"""".r.findFirstMatchIn(txt).map(_.group(1)).get
      val raw = Bench.extractPrevQueriesRaw(txt, sf)
      assert(raw.size >= 50 && raw.values.forall(_ >= 0))
      assert(Bench.extractPrevBwProbe(txt, sf).exists(v => v > 0 && v < 10))
    }
  }

  test("real BENCH_r04.json (front-truncated tail) returns empty without error") {
    readIfExists("BENCH_r04.json").foreach { txt =>
      // r4's 2000-char tail truncated queries_normalized away entirely;
      // the extractor must degrade to empty, not mis-parse fragments
      val m = Bench.extractPrevNormalized(txt, "/root/testdata/sf0.1")
      assert(m.isEmpty)
    }
  }
}
