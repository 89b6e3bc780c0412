package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Rank-ordered merge table standing in for a PUBLISHED tokenizer's
    * merges file — the tokenize-at-scale step encodes with a fixed,
    * already-released vocabulary (fitting it is `bpeFit`). Chain-ordered
    * (every multi-char lhs/rhs is produced by an earlier rank), so the
    * single-pass rank-order application below equals iterative
    * lowest-rank-first reapplication on any input. */
  val PinnedMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("e", "r"), ("a", "n"), ("an", "d"),
    ("o", "n"), ("r", "e"), ("e", "s"), ("o", "r"), ("s", "t"), ("in", "g"))

  /** Per-word token count under the pinned merges, as a pure Column over
    * the delimiter-wrapped symbol string ('low' → '|l||o||w|'): one
    * global replace() per merge IS a greedy non-overlapping left-to-right
    * pass (identical to `applyMerge`), and the token count is just the
    * delimiter count halved. Lowercase-alphabetic words are encoded;
    * anything else is OOV and falls back to one token per char (the
    * byte-level fallback every production BPE uses). */
  private def wordTokens(w: Column, merges: Seq[(String, String)]): Column = {
    val wrapped0 = regexp_replace(w, "(.)", "|$1|")
    val merged = merges.foldLeft(wrapped0) { case (s, (a, b)) =>
      replace(s, lit("|" + a + "||" + b + "|"), lit("|" + a + b + "|"))
    }
    val nTok = ((length(merged) - length(replace(merged, lit("|")))) / 2).cast("long")
    when(w.rlike("^[a-z]+$"), nTok).otherwise(length(w).cast("long"))
  }

  /** Corpus-wide BPE ENCODING with a fixed merge table — what the token
    * budget of a 10^12-row corpus is actually counted with once a
    * tokenizer ships. Everything is codegen'd built-ins inside one narrow
    * projection (split → transform → aggregate): zero UDFs, zero shuffle,
    * scan-speed. Per doc it pins the full distribution, not just a total:
    * token count, words that actually merged, and the sum of squared
    * per-word counts — a segmentation bug cannot survive all three.
    *
    * Output: (doc_id, n_words, n_tokens, n_merged_words, sum_sq_tokens).
    */
  def bpeEncode(docs: DataFrame,
                merges: Seq[(String, String)] = PinnedMerges): DataFrame = {
    val words = filter(split(col("text"), " "), w => w =!= lit(""))
    val d = docs.select(col("doc_id"), words.as("w"))
      .withColumn("t", transform(col("w"), w => wordTokens(w, merges)))
    val mergedFlags = zip_with(col("w"), col("t"), (w, t) =>
      when(w.rlike("^[a-z]+$") && t < length(w).cast("long"), lit(1L)).otherwise(lit(0L)))
    d.select(
      col("doc_id"),
      size(col("w")).cast("long").as("n_words"),
      aggregate(col("t"), lit(0L), (acc, x) => acc + x).as("n_tokens"),
      aggregate(mergedFlags, lit(0L), (acc, x) => acc + x).as("n_merged_words"),
      aggregate(col("t"), lit(0L), (acc, x) => acc + x * x).as("sum_sq_tokens"))
  }

  /** Vocabulary-coverage curve — the word-level tokenizer-design metric
    * (how big must the vocab be before the OOV/fallback rate is
    * tolerable?): corpus word frequencies rank by (count desc, word asc),
    * the top-k words form each candidate vocabulary, and every candidate
    * size reports the token mass it covers vs the OOV mass in integer
    * permille. The curve is the empirical complement of [[bpeFit]]: BPE
    * exists precisely because this curve flattens too slowly for open
    * vocabularies.
    *
    * Scale shape: ONE word-count shuffle over the corpus (map-side
    * combined); the rank window and the per-size conditional sums run on
    * the VOCABULARY-sized count table (types ≪ tokens — Heaps' law), and
    * the output is |sizes| rows. Output: (vocab_size, n_types,
    * covered_tokens, oov_tokens, oov_pm). */
  def vocabCoverage(docs: DataFrame,
                    sizes: Seq[Int] = Seq(1000, 2000, 4000)): DataFrame = {
    val counts = docs
      .select(explode(filter(split(col("text"), " ", -1),
        t => length(t) > 0)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("c").desc, col("w").asc)
    val ranked = counts.withColumn("r", row_number().over(w))
      .localCheckpoint(true) // vocab-sized; read once per candidate size
    val sizesDf = {
      val spark = docs.sparkSession
      import spark.implicits._
      sizes.map(_.toLong).toDF("vocab_size")
    }
    val out = sizesDf.crossJoin(ranked)
      .groupBy("vocab_size")
      .agg(
        sum(when(col("r") <= col("vocab_size"), 1L).otherwise(0L)).as("n_types"),
        sum(when(col("r") <= col("vocab_size"), col("c")).otherwise(0L))
          .as("covered_tokens"),
        sum(when(col("r") > col("vocab_size"), col("c")).otherwise(0L))
          .as("oov_tokens"))
      .withColumn("oov_pm",
        expr("oov_tokens * 1000 div (covered_tokens + oov_tokens)"))
      .localCheckpoint(true)
    ranked.unpersist(false)
    out
  }
}
