package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Multi-pattern blocklist matching (brand-safety / policy filtering) via
  * Aho–Corasick: ONE pass over each document finds every occurrence of
  * every pattern — the naive per-pattern scan costs P passes and is what
  * makes thousand-term blocklists unaffordable at corpus scale. The
  * automaton is built once per partition from the broadcast pattern list;
  * matching is O(chars + hits) per document regardless of |patterns|.
  *
  * Scale shape: typed per-row kernel on the scan (narrow plan, no
  * shuffle); the pattern list broadcasts. For the oracle, patterns are
  * chosen self-overlap-free so per-pattern occurrence counts equal the
  * non-overlapping replace arithmetic DuckDB can replay. */
object Blocklist {

  /** Classic Aho–Corasick: goto/fail/output over a dense child map. */
  final class Automaton(patterns: Seq[String]) extends Serializable {
    private val goto_ = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
    private val out = mutable.ArrayBuffer(List.empty[Int])
    private val fail = mutable.ArrayBuffer(0)

    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { ch =>
        s = goto_(s).getOrElseUpdate(ch, {
          goto_ += mutable.Map.empty[Char, Int]
          out += Nil
          fail += 0
          goto_.length - 1
        })
      }
      out(s) ::= pi
    }
    // BFS fail links
    private val queue = mutable.Queue.empty[Int]
    goto_(0).values.foreach { s => fail(s) = 0; queue.enqueue(s) }
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      goto_(r).foreach { case (ch, s) =>
        queue.enqueue(s)
        var f = fail(r)
        while (f != 0 && !goto_(f).contains(ch)) f = fail(f)
        fail(s) = if (goto_(f).contains(ch) && goto_(f)(ch) != s)
          goto_(f)(ch) else 0
        out(s) = out(s) ++ out(fail(s))
      }
    }

    /** Per-pattern occurrence counts in one left-to-right scan. */
    def countAll(text: String): Array[Long] = {
      val counts = new Array[Long](patterns.length)
      var s = 0
      var i = 0
      while (i < text.length) {
        val ch = text.charAt(i)
        while (s != 0 && !goto_(s).contains(ch)) s = fail(s)
        s = goto_(s).getOrElse(ch, 0)
        out(s).foreach(pi => counts(pi) += 1)
        i += 1
      }
      counts
    }
  }

  /** Default audit blocklist: lowercase phrases with no self-overlap (no
    * border of a pattern is also its prefix), so AC total occurrences =
    * non-overlapping replace counts and the SQL oracle is exact. */
  val DefaultPatterns: Seq[String] =
    Seq("spark", "hash join", "slow scan", "big table", "stream")

  /** Per-doc match profile: total hits, distinct patterns hit, the
    * dominant pattern (most hits, index tie-break), and the block flag
    * (any hit). Only docs with ≥1 hit emit (the overwhelming majority of
    * a corpus never matches a blocklist — emitting only hits keeps the
    * output hit-sized). */
  def scan(docs: DataFrame,
           patterns: Seq[String] = DefaultPatterns): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val pats = patterns.toIndexedSeq
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val ac = new Automaton(pats)
        it.flatMap { case (id, text) =>
          val c = ac.countAll(text)
          val total = c.sum
          if (total == 0L) None
          else {
            var best = 0
            var bi = 1
            while (bi < c.length) {
              if (c(bi) > c(best)) best = bi
              bi += 1
            }
            Some((id, total, c.count(_ > 0L).toLong, pats(best), c(best)))
          }
        }
      }
      .toDF("doc_id", "total_hits", "n_patterns", "top_pattern", "top_hits")
  }
}
