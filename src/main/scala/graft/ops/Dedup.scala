package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Large-scale training-data deduplication operators over the `documents`
  * table: exact (hash group-by), MinHash+LSH banding, SimHash, and blocked
  * n-gram Jaccard. All deterministic (MurmurHash3 / md5 — stable across JVMs
  * and runs) so results are oracle-checkable.
  *
  * Scale notes: exact dedup is one hash-shuffle; MinHash-LSH shuffles
  * (band-hash → bucket) then verifies only bucket-local pairs — never the
  * O(n²) cross join; at 10^12 docs the band-bucket join is the only quadratic
  * risk and it's bounded by bucket size (salt-cap large buckets upstream).
  */
object Dedup {

  /** The corpus used by dedup correctness queries: documents ∪ deterministic
    * near-dup replicas (text prefix, id+100000) — synthesized identically in
    * the DuckDB oracle SQL (substr is 1-based in both engines). */
  def corpusWithReplicas(docs: DataFrame): DataFrame = {
    val nearDups = docs
      .where(length(col("text")) > 60)
      .select(
        (col("doc_id") + 100000L).as("doc_id"),
        expr("substr(text, 1, length(text) - 15)").as("text"))
    val exactDups = docs
      .where(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 200000L).as("doc_id"), col("text"))
    docs.select(col("doc_id"), col("text")).unionByName(nearDups).unionByName(exactDups)
  }

  /** Exact dedup: md5 groups with >1 member → (h, cnt, keeper). */
  def exact(corpus: DataFrame): DataFrame =
    corpus.groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keeper"))
      .where(col("cnt") > 1)

  /** Word 3-gram shingle set, distinct, as a column (array<string>). */
  def shingles3(text: Column): Column = {
    val toks = split(text, " ")
    array_distinct(filter(
      transform(toks, (_, i) =>
        when(i + 2 < size(toks), concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2), element_at(toks, i + 3)))),
      x => x.isNotNull))
  }

  /** Deterministic 64-bit shingle hash (MurmurHash3 x2 — stable). */
  @inline def shingleHash(s: String): Long =
    (scala.util.hashing.MurmurHash3.stringHash(s, 0x9747b28c).toLong << 32) |
      (scala.util.hashing.MurmurHash3.stringHash(s, 0x85ebca6b).toLong & 0xffffffffL)

  /** splitmix64 avalanche — a deterministic, well-mixing permutation proxy. */
  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** MinHash signature: k seeded avalanche hashes, unsigned-min per seed.
    * Seeds derive from the index — deterministic, no RNG state. */
  def minhashSignature(shingles: Seq[String], k: Int): Array[Long] = {
    val hs = shingles.map(shingleHash).toArray
    val sig = Array.fill(k)(-1L) // unsigned max
    var i = 0
    while (i < k) {
      val seed = mix64(0xC2B2AE3D27D4EB4FL * (i + 1))
      var j = 0
      while (j < hs.length) {
        val h = mix64(hs(j) ^ seed)
        if (java.lang.Long.compareUnsigned(h, sig(i)) < 0) sig(i) = h
        j += 1
      }
      i += 1
    }
    sig
  }

  /** MinHash+LSH near-dup pairs with exact verification.
    * k hashes split into `bands`; docs sharing any band bucket become
    * candidates; candidates are verified with exact shingle-set Jaccard and
    * reported as integer (inter, union) counts — exactly comparable with a
    * brute-force oracle. Output: (a, b, inter_cnt, union_cnt) with a < b,
    * inter/union ≥ threshold. */
  def minhashLsh(corpus: DataFrame, k: Int = 64, bands: Int = 16,
                 threshold: Double = 0.7): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val rows = bands
    val rowsPerBand = k / rows
    val withShingles = corpus
      .select(col("doc_id"), shingles3(col("text")).as("sh"))
      .where(size(col("sh")) > 0)
      .as[(Long, Seq[String])]
    val sigs = withShingles.map { case (id, sh) =>
      val sig = minhashSignature(sh, k)
      val bandKeys = (0 until bands).map { b =>
        val slice = sig.slice(b * rowsPerBand, (b + 1) * rowsPerBand)
        s"$b:${slice.mkString(",")}".hashCode.toLong & 0xffffffffL | (b.toLong << 32)
      }
      (id, sh, bandKeys)
    }.toDF("doc_id", "sh", "band_keys")

    val exploded = sigs.select(col("doc_id"), col("sh"), explode(col("band_keys")).as("bk"))
    val l = exploded.select(col("bk"), col("doc_id").as("a"), col("sh").as("sha"))
    val r = exploded.select(col("bk"), col("doc_id").as("b"), col("sh").as("shb"))
    val cand = l.join(r, Seq("bk")).where(col("a") < col("b"))
      .select(col("a"), col("b"), col("sha"), col("shb"))
      .dropDuplicates("a", "b")
    cand
      .withColumn("inter_cnt", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("union_cnt", size(array_union(col("sha"), col("shb"))))
      .where(col("inter_cnt") >= col("union_cnt") * threshold)
      .select(col("a"), col("b"), col("inter_cnt").cast("long").as("inter_cnt"),
        col("union_cnt").cast("long").as("union_cnt"))
  }

  /** Blocked exact n-gram Jaccard: pairwise within a blocking key (first
    * token), SQL-replicable. Output matches minhashLsh's shape. */
  def jaccardBlocked(corpus: DataFrame, threshold: Double = 0.5): DataFrame = {
    val withSh = corpus.select(
      col("doc_id"),
      split(col("text"), " ").getItem(0).as("blk"),
      shingles3(col("text")).as("sh"))
      .where(size(col("sh")) > 0)
    val l = withSh.select(col("blk"), col("doc_id").as("a"), col("sh").as("sha"))
    val r = withSh.select(col("blk"), col("doc_id").as("b"), col("sh").as("shb"))
    l.join(r, Seq("blk")).where(col("a") < col("b"))
      .withColumn("inter_cnt", size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .withColumn("union_cnt", size(array_union(col("sha"), col("shb"))).cast("long"))
      .where(col("inter_cnt") >= col("union_cnt") * threshold)
      .select("a", "b", "inter_cnt", "union_cnt")
  }

  /** 64-bit SimHash over word 3-gram shingles. Deterministic. */
  def simhash64(shingles: Seq[String]): Long = {
    val acc = new Array[Int](64)
    shingles.foreach { s =>
      val h = shingleHash(s)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) acc(bit) += 1 else acc(bit) -= 1
        bit += 1
      }
    }
    var out = 0L
    var bit = 0
    while (bit < 64) { if (acc(bit) > 0) out |= (1L << bit); bit += 1 }
    out
  }

  /** SimHash near-dup pairs: bucket by 16-bit bands of the fingerprint
    * (4 bands → hamming ≤ 3 guaranteed candidate recall), verify hamming. */
  def simhashPairs(corpus: DataFrame, maxHamming: Int = 3): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val fps = corpus.select(col("doc_id"), shingles3(col("text")).as("sh"))
      .where(size(col("sh")) > 0)
      .as[(Long, Seq[String])]
      .map { case (id, sh) => (id, simhash64(sh)) }
      .toDF("doc_id", "fp")
    val banded = fps.select(col("doc_id"), col("fp"),
      explode(array((0 until 4).map(b =>
        concat_ws(":", lit(b), shiftrightunsigned(col("fp"), b * 16).bitwiseAND(lit(0xffffL)).cast("string"))): _*)).as("bk"))
    val l = banded.select(col("bk"), col("doc_id").as("a"), col("fp").as("fpa"))
    val r = banded.select(col("bk"), col("doc_id").as("b"), col("fp").as("fpb"))
    l.join(r, Seq("bk")).where(col("a") < col("b"))
      .dropDuplicates("a", "b")
      .withColumn("hamming", bit_count(col("fpa").bitwiseXOR(col("fpb"))))
      .where(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming").cast("long").as("hamming"))
  }
}
