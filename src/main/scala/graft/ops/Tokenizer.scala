package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary induction (Sennrich et al. 2016) — the
  * tokenizer-fit step of an LM data pipeline. Exactly the shape production
  * trainers (SentencePiece, HF tokenizers) use: the CORPUS-side work — the
  * word-frequency histogram — is the distributed pass (one word-count
  * shuffle, map-side combined), and the merge loop runs on the bounded
  * top-V histogram, because pair statistics over V word types are
  * histogram-sized, not corpus-sized. The driver holds V (word, count)
  * rows — O(V), never O(corpus) — and V is an explicit cap (real trainers
  * cap identically; tail types contribute ~nothing to merge counts).
  *
  * Semantics (hand-checkable, engine-portable):
  *  - fit is over lowercase-alphabetic word types only (`^[a-z]+$`) — the
  *    standard pre-tokenizer would route digits/punctuation separately;
  *  - pair counts are ALL adjacent symbol pairs (overlapping, Sennrich's
  *    get_stats), weighted by word frequency;
  *  - argmax tie-break: (count desc, left asc, right asc) — deterministic
  *    across engines (binary ASCII ordering);
  *  - a merge applies greedily left-to-right, non-overlapping — identical
  *    to SQL replace() over a delimiter-wrapped symbol string, which is
  *    how the DuckDB oracle replays the loop (unrolled CTE per round).
  */
object Tokenizer {

  /** Top-V lowercase word types by (count desc, word asc). */
  def wordHistogram(docs: DataFrame, vocabCap: Int): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .where(col("word").rlike("^[a-z]+$"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(vocabCap)

  /** One greedy left-to-right merge pass (== non-overlapping replace). */
  private[ops] def applyMerge(toks: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.result()
  }

  /** Fit `nMerges` BPE merges on the histogram; returns the merge table
    * (merge_rank, lhs, rhs, merged, pair_count). Stops early if no pair
    * remains. */
  private[ops] def fitMerges(hist: Seq[(String, Long)], nMerges: Int): Seq[(Long, String, String, String, Long)] = {
    var words: Seq[(Vector[String], Long)] =
      hist.map { case (w, c) => (w.toVector.map(_.toString), c) }
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    var rank = 1L
    var done = false
    while (rank <= nMerges && !done) {
      val pairs = new scala.collection.mutable.HashMap[(String, String), Long]()
      words.foreach { case (t, c) =>
        var i = 0
        while (i + 1 < t.length) {
          val k = (t(i), t(i + 1))
          pairs.update(k, pairs.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (pairs.isEmpty) done = true
      else {
        val ((a, b), c) = pairs.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((rank, a, b, a + b, c))
        words = words.map { case (t, wc) => (applyMerge(t, a, b), wc) }
        rank += 1
      }
    }
    merges.result()
  }

  /** End-to-end fit as a query: distributed histogram → bounded collect →
    * merge loop → merge-table DataFrame. */
  def bpeFit(docs: DataFrame, vocabCap: Int = 300, nMerges: Int = 10): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hist = wordHistogram(docs, vocabCap).as[(String, Long)].collect().toSeq
    fitMerges(hist, nMerges)
      .toDF("merge_rank", "lhs", "rhs", "merged", "pair_count")
  }
}
