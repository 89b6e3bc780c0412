package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** BPE merge-fit semantics: Sennrich pair counting (overlapping), greedy
  * non-overlapping merge application, deterministic tie-breaks. */
class TokenizerSpec extends AnyFunSuite {

  lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  test("applyMerge: greedy left-to-right, non-overlapping") {
    assert(Tokenizer.applyMerge(Vector("a", "a", "a"), "a", "a") == Vector("aa", "a"))
    assert(Tokenizer.applyMerge(Vector("a", "a", "a", "a"), "a", "a") == Vector("aa", "aa"))
    assert(Tokenizer.applyMerge(Vector("a", "b", "a", "b"), "a", "b") == Vector("ab", "ab"))
    assert(Tokenizer.applyMerge(Vector("x"), "a", "b") == Vector("x"))
  }

  test("fitMerges: hand-computed three-merge trajectory") {
    // aaab×3, ab×2: pairs r1: (a,a)=2·3=6 (overlapping), (a,b)=3+2=5 → merge aa
    // r2: aaab=[aa,a,b], ab=[a,b]: (aa,a)=3, (a,b)=3+2=5 → merge ab
    // r3: aaab=[aa,ab], ab=[ab]: (aa,ab)=3 → merge aaab
    val m = Tokenizer.fitMerges(Seq(("aaab", 3L), ("ab", 2L)), 5)
    // after merge 3 every word is a single symbol → early stop at 3 merges
    assert(m == Seq(
      (1L, "a", "a", "aa", 6L),
      (2L, "a", "b", "ab", 5L),
      (3L, "aa", "ab", "aaab", 3L)))
  }

  test("fitMerges: count ties break lexicographically on (lhs, rhs)") {
    val m = Tokenizer.fitMerges(Seq(("xy", 2L), ("yx", 2L)), 1)
    assert(m == Seq((1L, "x", "y", "xy", 2L)))
  }

  test("bpeFit: end-to-end on a DataFrame, histogram filter and weighting") {
    val docs = Seq(
      "the the the cat 123 cat!",
      "the cat sat").toDF("text")
    // word types passing ^[a-z]+$: the×4, cat×2 (cat! fails), sat×1
    val m = Tokenizer.bpeFit(docs, vocabCap = 300, nMerges = 2)
      .as[(Long, String, String, String, Long)].collect().toSeq
    // r1 pairs: (t,h)=4, (h,e)=4, (c,a)=2, (a,t)=2+1, (s,a)=1 → tie (h,e)/(t,h)
    //   at 4 → lex: (h,e) first. r2: (t,he)=4 wins over (a,t)=3.
    assert(m == Seq((1L, "h", "e", "he", 4L), (2L, "t", "he", "the", 4L)))
  }
}
