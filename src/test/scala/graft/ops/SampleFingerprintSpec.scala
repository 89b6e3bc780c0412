package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSessionFixture

/** Priority sampling (Sampling.prioritySample), winnowing fingerprints
  * (TextStats.winnow) and cross-snapshot fuzzy dedup
  * (Dedup.minhashLshCross) — each checked against an independent
  * in-test Scala reference implementation. */
class SampleFingerprintSpec extends AnyFunSuite {

  lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  /** Reference md5-little-endian-u64 mod m (≡ Sampling.md5Mod ≡ DuckDB
    * md5_number_upper % m). */
  private def md5ModRef(s: String, m: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val v = java.nio.ByteBuffer.wrap(d, 0, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
    java.lang.Long.remainderUnsigned(v, m)
  }

  test("md5Mod column matches the reference construction") {
    val vals = Seq("", "a", "prio:17", "hello world", "züricher")
    val got = vals.toDF("s")
      .select(Sampling.md5Mod(col("s"), 1048576L)).as[Long].collect().toSeq
    assert(got == vals.map(md5ModRef(_, 1048576L)))
  }

  test("prioritySample: top-k by w*M div (h+1), threshold is rank k+1, DLT estimator") {
    val docs = (0L until 40L).map(i => (i, 10L + (i % 7) * 100L))
      .toDF("doc_id", "n_chars")
    val k = 5
    val out = Sampling.prioritySample(docs, k)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
      .sortBy(r => (-r._3, r._1))
    // reference: same arithmetic in plain Scala
    val ref = (0L until 40L).map { i =>
      val w = 10L + (i % 7) * 100L
      val h = md5ModRef(s"prio:$i", 1048576L)
      (i, w, w * 1048576L / (h + 1))
    }.sortBy(r => (-r._3, r._1))
    val thr = ref(k)._3
    val expect = ref.take(k).map { case (id, w, q) => (id, w, q, thr, math.max(w, thr)) }
    assert(out == expect)
  }

  /** Reference winnowing over char k-grams, rightmost-min window select. */
  private def winnowRef(text: String, k: Int = 8, w: Int = 4): (Long, Seq[(Long, Long)]) = {
    if (text.length < k) return (0L, Nil)
    val gs = (0 to text.length - k).map(i => md5ModRef(text.substring(i, i + k), 1L << 31))
    if (gs.length < w) return (gs.length.toLong, Nil)
    val sel = (0 to gs.length - w).map { j0 =>
      val win = gs.slice(j0, j0 + w)
      val m = win.min
      ((j0 + win.lastIndexOf(m) + 1).toLong, m) // 1-based gram position
    }.distinct
    (gs.length.toLong, sel)
  }

  test("winnow matches the reference fold, including short-text edges") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaa", // constant grams → heavy ties, rightmost select
      "abcabcabcabcabcabc",   // periodic grams → repeated fingerprints dedupe
      "short",                // < k chars → 0 grams
      "exactly8!",            // 2 grams < w → none selected
      "")
    val out = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TextStats.winnow(out).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val expect = texts.zipWithIndex.map { case (t, i) =>
      val (ng, sel) = winnowRef(t)
      (i.toLong, ng, sel.size.toLong,
        sel.map(_._2).foldLeft(0L)(_ ^ _), sel.map(_._1).sum)
    }
    assert(got == expect)
  }

  test("winnow guarantee: shared substring of length >= k+w-1 shares a fingerprint") {
    val shared = "this exact span is common to both documents"
    val a = "prefix one here " + shared + " tail a"
    val b = "completely different lead " + shared + " other end"
    def hashes(t: String) = winnowRef(t)._2.map(_._2).toSet
    assert((hashes(a) intersect hashes(b)).nonEmpty)
  }

  test("minhashLshCross: planted near-dups match their source, fresh docs match nothing") {
    val words = (1 to 40).map(i => s"w$i").mkString(" ")
    val other = (100 to 140).map(i => s"v$i").mkString(" ")
    val old = Seq((1L, words), (2L, other)).toDF("doc_id", "text")
    val newSnap = Seq(
      (301L, words.substring(0, words.length - 12)), // near-dup of 1
      (401L, "fresh " + other.reverse))              // fresh
      .toDF("doc_id", "text")
    val out = Dedup.minhashLshCross(old, newSnap)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // reference Jaccard on distinct word 3-gram shingles
    def sh(t: String) = Dedup.shingleStrings(t).toSet
    val inter = (sh(words) intersect sh(words.substring(0, words.length - 12))).size.toLong
    val union = (sh(words) union sh(words.substring(0, words.length - 12))).size.toLong
    assert(inter >= union * 0.7)
    assert(out == Seq((301L, 1L, inter, union)))
  }

  test("synthNewSnapshot: near-dups keep id+300000, fresh ids +400000, cap at 1000") {
    val docs = (0L until 12L).map(i => (i, ("x" * 70) + s" doc $i tail padding here"))
      .toDF("doc_id", "text")
    val out = Dedup.synthNewSnapshot(docs).select("doc_id").as[Long].collect().toSet
    val expectNear = (0L until 12L).filter(_ % 3 == 0).map(_ + 300000L).toSet
    val expectFresh = (0L until 12L).filter(_ % 3 == 1).map(_ + 400000L).toSet
    assert(out == (expectNear ++ expectFresh))
  }
}
