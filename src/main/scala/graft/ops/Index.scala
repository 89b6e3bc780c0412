package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Inverted-index construction — term → (document frequency, postings) —
  * the retrieval-side artifact a corpus pipeline emits for search and
  * decontamination lookups.
  *
  * The classic failure at web scale is `collect_list(doc_id)` per term:
  * stopword postings are corpus-sized and one reducer materializes them
  * before any cutoff can apply. Here the aggregation state is CAPPED at
  * the source: a typed Aggregator keeps at most `maxDf + 1` ids per
  * buffer (map-side partials included), while the exact df rides a
  * separate counter. Terms with df ≤ maxDf were never truncated anywhere
  * (every partial holds ≤ df ids), so their postings are exact; hotter
  * terms keep exact df and drop postings — ONE ids-only shuffle, state
  * bounded by maxDf regardless of skew. */
object Index {

  private final class CappedPostings(cap: Int)
      extends Aggregator[(String, Long), (Long, Vector[Long]), (Long, Vector[Long])] {
    def zero: (Long, Vector[Long]) = (0L, Vector.empty)
    def reduce(b: (Long, Vector[Long]), a: (String, Long)): (Long, Vector[Long]) =
      (b._1 + 1, if (b._2.length <= cap) b._2 :+ a._2 else b._2)
    def merge(a: (Long, Vector[Long]), b: (Long, Vector[Long])): (Long, Vector[Long]) =
      (a._1 + b._1,
        if (a._2.length >= cap + 1) a._2
        else (a._2 ++ b._2).take(cap + 1))
    def finish(r: (Long, Vector[Long])): (Long, Vector[Long]) = r
    def bufferEncoder: Encoder[(Long, Vector[Long])] =
      Encoders.tuple(Encoders.scalaLong, Encoders.kryo[Vector[Long]])
    def outputEncoder: Encoder[(Long, Vector[Long])] =
      Encoders.tuple(Encoders.scalaLong, Encoders.kryo[Vector[Long]])
  }

  /** term → (df, comma-joined sorted postings; empty when df > maxDf). */
  def invertedIndex(docs: DataFrame, maxDf: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tok = docs.select(col("doc_id"),
        explode(array_distinct(
          filter(split(col("text"), " ", -1), t => length(t) > 0))).as("term"))
      .as[(Long, String)]
      .map { case (id, term) => (term, id) }
    tok.groupByKey(_._1)
      .agg(new CappedPostings(maxDf).toColumn.name("p"))
      .map { case (term, (df, ids)) =>
        (term, df, if (df <= maxDf) ids.sorted.mkString(",") else "")
      }
      .toDF("term", "df", "postings")
  }
}
