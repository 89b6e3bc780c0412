package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data assembly operators: fixed-window chunking and sequence
  * packing — the last pipeline steps before tokenized shards are written.
  * Both are deterministic (re-runs and engines agree bit-for-bit) and
  * shuffle nothing bigger than they must: chunking is a narrow generate,
  * packing shuffles once on a salted shard key so the global-prefix-sum
  * trap (a single-partition window) never appears. */
object Assemble {

  private def toks(c: Column): Column =
    filter(split(c, " ", -1), t => length(t) > 0)

  /** Fixed-size token-window chunking with overlap: windows of `window`
    * whitespace tokens starting every `stride` tokens (stride < window ⇒
    * overlapping context windows, the usual LM-pretraining shape). Chunk
    * count for n tokens is 1 + ceil((n−window)/stride) (n > window), so
    * every token lands in ≥1 chunk and the tail chunk may be short.
    *
    * Scale shape: pure narrow Generate(explode) + Project over the scan —
    * zero shuffle, no UDFs; the token array is built once per row and
    * sliced per chunk inside whole-stage codegen. */
  def chunk(docs: DataFrame, window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window)
    docs
      .select(col("doc_id"), toks(col("text")).as("toks"))
      .withColumn("n_tokens", size(col("toks")))
      .where(col("n_tokens") > 0)
      .withColumn("n_chunks",
        when(col("n_tokens") <= window, lit(1L)).otherwise(
          lit(1L) + floor((col("n_tokens") - window + (stride - 1))
            .cast("double") / stride)))
      .select(col("doc_id"), col("toks"), col("n_tokens"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .select(
        col("doc_id"),
        col("chunk_idx"),
        least(lit(window.toLong),
          col("n_tokens") - col("chunk_idx") * stride).as("chunk_tokens"),
        array_join(slice(col("toks"),
          (col("chunk_idx") * stride + 1).cast("int"), lit(window)), " ")
          .as("chunk_text"))
  }

  /** Sequence packing (sharded sequential fill): documents are assigned
    * to fixed-capacity bins of `seqLen` tokens by their starting offset
    * in a deterministic per-shard order. Shard = salted md5 bucket of
    * doc_id (so shards are balanced and reproducible); within a shard
    * docs are taken in doc_id order and a doc whose running start offset
    * falls in [k·seqLen, (k+1)·seqLen) packs into bin k (docs may
    * straddle — the writer splits them, as LM pretraining packers do).
    *
    * Scale shape: ONE shuffle on the shard key feeds the running-sum
    * window; the (shard, bin) aggregate reuses that partitioning (bin is
    * shard-local), so no second data shuffle exists. A global (unsharded)
    * prefix sum would serialize on one partition — sharding is what makes
    * packing parallel at 10^12 docs, and shard count scales with the
    * cluster, not the data. */
  def pack(docs: DataFrame, seqLen: Int, nShards: Int = 8,
           salt: String = "pack"): DataFrame = {
    require(seqLen > 0 && nShards > 0)
    val shard = pmod(
      Sampling.md5Bucket(concat(lit(s"$salt:"), col("doc_id").cast("string"))),
      lit(nShards))
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), shard.as("shard"),
        size(toks(col("text"))).cast("long").as("n_tokens"))
      .where(col("n_tokens") > 0)
      .withColumn("start_off", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("bin_id", floor(col("start_off").cast("double") / seqLen))
      .groupBy(col("shard"), col("bin_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }
}
