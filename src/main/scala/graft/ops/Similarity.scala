package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (Array[Float]): brute-force cosine top-k as the exactness baseline, and an
  * LSH-bucketed variant (random-hyperplane signs) as the 100-TB scale path.
  *
  * Scale notes: brute-force is a broadcast of the (small) query set against
  * a full scan of the corpus — one pass, no shuffle except the final top-k
  * aggregation; the LSH variant prunes the scan to matching sign-buckets,
  * trading recall for a corpus-side shuffle-free bucket lookup. Dot products
  * run inside codegen'd higher-order functions (zip_with + aggregate), not
  * UDFs. */
object Similarity {

  /** Cosine similarity between two array<float|double> columns, computed in
    * double, as a codegen-friendly expression (functions.aggregate/zip_with —
    * no UDF). */
  def cosineCol = {
    expr("""
      aggregate(zip_with(qe, ce, (x, y) -> cast(x as double) * cast(y as double)), 0D, (s, v) -> s + v)
      / (sqrt(aggregate(qe, 0D, (s, v) -> s + cast(v as double) * cast(v as double)))
         * sqrt(aggregate(ce, 0D, (s, v) -> s + cast(v as double) * cast(v as double))))
    """)
  }

  /** Brute-force cosine top-k: queries (vec_id < nQueries) × corpus. The
    * query side is broadcast; ties break by neighbor id. Output:
    * (vec_id, rank, neighbor_id, sim rounded to 4dp). */
  def bruteForceTopK(embeddings: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val queries = embeddings.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val corpus = embeddings.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val scored = corpus.crossJoin(broadcast(queries))
      .where(col("qid") =!= col("cid"))
      .withColumn("sim", cosineCol)
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid").as("vec_id"), col("rank").cast("long").as("rank"),
        col("cid").as("neighbor_id"), round(col("sim"), 4).as("sim"))
  }

  /** Random-hyperplane LSH signature (sign bits of h deterministic pseudo
    * projections). Buckets share sign prefixes; probing the query's bucket
    * (plus single-bit flips) retrieves candidates. */
  def hyperplaneSig(vec: Seq[Float], bits: Int): Long = {
    var out = 0L
    var b = 0
    while (b < bits) {
      var acc = 0.0
      var i = 0
      while (i < vec.length) {
        // deterministic pseudo-gaussian weight from (b, i)
        val h = {
          var z = (b.toLong << 32 | i.toLong) + 0x9E3779B97F4A7C15L
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          z ^ (z >>> 31)
        }
        acc += vec(i) * (h.toDouble / Long.MaxValue.toDouble)
        i += 1
      }
      if (acc > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** LSH-bucketed ANN: candidates share the exact sign-bucket or differ in
    * one bit (multi-probe); exact cosine re-rank inside buckets. Recall < 1
    * by design — the scale path; pair with bruteForceTopK as the oracle on
    * samples. */
  def lshTopK(embeddings: DataFrame, nQueries: Int, k: Int, bits: Int = 12): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val sigged = embeddings.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])]
      .map { case (id, e) => (id, e, hyperplaneSig(e, bits)) }
      .toDF("vec_id", "embedding", "sig")
    // corpus exploded to its own bucket; queries probe bucket + 1-bit flips
    val corpusB = sigged.select(col("vec_id").as("cid"), col("embedding").as("ce"), col("sig").as("bkt"))
    val probeMasks: Seq[Long] = Seq(0L) ++
      (0 until bits).map(b => 1L << b) ++
      (for (a <- 0 until bits; b <- a + 1 until bits) yield (1L << a) | (1L << b))
    val queriesB = sigged.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("sig"))
      .withColumn("probe", explode(array(
        probeMasks.map(m => col("sig").bitwiseXOR(lit(m))): _*)))
    val cand = corpusB.join(broadcast(queriesB), col("bkt") === col("probe"))
      .where(col("qid") =!= col("cid"))
      .dropDuplicates("qid", "cid")
      .withColumn("sim", cosineCol)
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid").asc)
    cand.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid").as("vec_id"), col("rank").cast("long").as("rank"),
        col("cid").as("neighbor_id"), round(col("sim"), 4).as("sim"))
  }
}
