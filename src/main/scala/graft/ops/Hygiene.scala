package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-hygiene and lake-operations operators: script detection for
  * multilingual routing, keeper selection for dedup clusters, embedding
  * sanity flags, and small-file compaction planning. All integer /
  * deterministic — each replays exactly in the DuckDB oracle. */
object Hygiene {

  /** Deterministic multilingual planting — the corpus is ASCII, so script
    * routing needs planted non-Latin runs. Two residue channels append
    * Cyrillic and CJK snippets; mirrored verbatim in the oracle. */
  def corpusWithScripts(docs: DataFrame): DataFrame =
    docs.withColumn("text",
      concat(col("text"),
        when(col("doc_id") % 4 === 0, lit(" пример текста для проверки"))
          .otherwise(lit("")),
        when(col("doc_id") % 6 === 0, lit(" 中文样本文本")).otherwise(lit(""))))

  /** Unicode-script profile per document — the first-pass multilingual
    * router (script detection is cheaper and more reliable than n-gram
    * language ID, and decides which language-ID model even applies):
    * per-script char counts by codepoint range + the dominant script.
    * One codegen'd regexp projection, zero shuffle. */
  def scriptProfile(docs: DataFrame): DataFrame = {
    def countClass(cls: String) =
      length(col("text")) - length(regexp_replace(col("text"), cls, ""))
    docs
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        countClass("[A-Za-z]").cast("long").as("n_latin"),
        countClass("[\\u0400-\\u04FF]").cast("long").as("n_cyrillic"),
        countClass("[\\u4E00-\\u9FFF]").cast("long").as("n_cjk"))
      .withColumn("dominant",
        when(col("n_cyrillic") > col("n_cjk") && col("n_cyrillic") > col("n_latin"), "cyrillic")
          .when(col("n_cjk") > col("n_latin"), "cjk")
          .otherwise("latin"))
  }

  /** Script SEGMENTATION (the router's sibling): contiguous same-script
    * runs with char offsets, so a multilingual page can be split and each
    * segment routed to its own langid/tokenizer instead of letting the
    * dominant script swallow the page. Classes: latin / cyrillic / cjk by
    * codepoint range; neutral chars (spaces, digits, punct) extend the
    * CURRENT run, and a leading neutral prefix joins the first scripted
    * run — so segment boundaries sit exactly where the script actually
    * changes. Data-dependent per-row loop → typed kernel (the winnow
    * lesson), one narrow pass, zero shuffle. Output: one row per segment
    * (doc_id, seg_idx, script, start, n_chars). */
  def scriptSegments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].flatMap { case (id, text) =>
      @inline def cls(c: Char): Int =
        if (c >= 'A' && c <= 'Z' || c >= 'a' && c <= 'z') 1
        else if (c >= 'Ѐ' && c <= 'ӿ') 2
        else if (c >= '一' && c <= '鿿') 3
        else 0
      val names = Array("none", "latin", "cyrillic", "cjk")
      val segs = Vector.newBuilder[(Long, Long, String, Long, Long)]
      var segStart = 0
      var segCls = 0
      var idx = 0L
      var i = 0
      while (i < text.length) {
        val k = cls(text.charAt(i))
        if (k != 0 && k != segCls) {
          if (segCls != 0) {
            segs += ((id, idx, names(segCls), segStart.toLong, (i - segStart).toLong))
            idx += 1
            segStart = i
          } // leading neutral prefix stays glued to the first scripted run
          segCls = k
        }
        i += 1
      }
      if (text.nonEmpty)
        segs += ((id, idx, names(segCls), segStart.toLong, (text.length - segStart).toLong))
      segs.result()
    }.toDF("doc_id", "seg_idx", "script", "seg_start", "n_chars")
  }

  /** Keeper selection — AFTER near-dup clustering, which copy survives?
    * Naive min-id keeps whatever crawled first; real pipelines keep the
    * BEST copy: longest extracted text, ties to the smallest id (stable).
    * One max_by struct rollup per cluster + one join back to tag every
    * member with its cluster's keeper. Both shuffles are on the cluster
    * key; the metadata join is doc-keyed sort-merge. */
  def keeperPolicy(clusters: DataFrame, meta: DataFrame): DataFrame = {
    val joined = clusters.join(meta, "doc_id")
    val keepers = joined.groupBy(col("cluster_id"))
      .agg(max(struct(col("n_chars").as("kn"), (-col("doc_id")).as("knegid"))).as("k"),
           count(lit(1)).as("cluster_size"))
      .select(col("cluster_id"), (-col("k.knegid")).as("keeper_id"),
        col("k.kn").as("keeper_chars"), col("cluster_size"))
    joined.join(keepers, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("keeper_id"),
        (col("doc_id") === col("keeper_id")).as("is_keeper"),
        col("cluster_size"))
  }

  /** Embedding sanity flags — the ingest gate for vector columns: NaN
    * components, zero vectors, and out-of-range norms all poison ANN
    * indexes silently (a single NaN makes every cosine NaN and the row
    * matches NOTHING — it just vanishes from retrieval). Integer
    * milli-norm; one narrow projection + a one-row rollup. */
  def embeddingHygiene(vecs: DataFrame): DataFrame = {
    val sq = expr(
      "aggregate(embedding, 0D, (s, v) -> s + cast(v as double) * cast(v as double))")
    val flagged = vecs.select(col("vec_id"),
      expr("exists(embedding, v -> isnan(v))").as("has_nan"),
      sq.as("sq"))
      .select(col("vec_id"), col("has_nan"),
        when(col("has_nan"), lit(-1L))
          .otherwise(floor(sqrt(col("sq")) * 1000).cast("long")).as("norm_milli"))
      .withColumn("is_zero", col("norm_milli") === 0L)
      // healthy synthetic embeddings live in a broad norm band
      .withColumn("out_of_range",
        !col("has_nan") && !col("is_zero") &&
          (col("norm_milli") < 100 || col("norm_milli") > 100000))
    flagged.agg(count(lit(1)).as("n_vectors"),
      sum(when(col("has_nan"), 1L).otherwise(0L)).as("n_nan"),
      sum(when(col("is_zero"), 1L).otherwise(0L)).as("n_zero"),
      sum(when(col("out_of_range"), 1L).otherwise(0L)).as("n_out_of_range"),
      min(when(!col("has_nan") && !col("is_zero"), col("norm_milli"))).as("min_norm_milli"),
      max(col("norm_milli")).as("max_norm_milli"))
  }

  /** Small-file compaction planning — the operational tax of streaming
    * ingest into a lake: thousands of KB-scale files per partition wreck
    * scan throughput (task-per-file overhead), so a compactor groups
    * consecutive files into ~target-size merge jobs. Greedy NEXT-FIT by
    * running sum: group = (cumulative bytes BEFORE this file) div target
    * — one prefix-sum window per partition key (each partition's file
    * list is bounded), then an algebraic per-group rollup. Deterministic
    * and exactly SQL-replayable, unlike best-fit bin packing. */
  def compactionPlan(files: DataFrame, targetBytes: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("part")).orderBy(col("file_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    files
      .select(col("part"), col("file_id"), col("bytes"),
        coalesce(sum(col("bytes")).over(w), lit(0L)).as("before"))
      .select(col("part"), col("file_id"), col("bytes"),
        expr(s"before div CAST($targetBytes AS BIGINT)").as("grp"))
      .groupBy(col("part"), col("grp"))
      .agg(count(lit(1)).as("n_files"),
           sum(col("bytes")).as("group_bytes"),
           min(col("file_id")).as("first_file"),
           max(col("file_id")).as("last_file"))
  }

  /** Mojibake planting: docs with doc_id % 7 == 0 get "café naïve" in its
    * classic UTF-8-read-as-Latin-1 form (é → Ã©, ï → Ã¯) — what a crawler
    * harvests from a page served UTF-8 but declared ISO-8859-1. Mirrored
    * in the oracle via chr() so the bytes are pinned. */
  def corpusWithMojibake(docs: DataFrame): DataFrame =
    docs.withColumn("text",
      concat(col("text"),
        when(col("doc_id") % 7 === 0,
          lit(" cafÃ© naÃ¯ve")).otherwise(lit(""))))

  /** Mojibake detection + repair (the ftfy move, Speer 2019): text whose
    * chars are really UTF-8 bytes misread as Latin-1 is detected by the
    * indicator char U+00C3 ("Ã" — the first byte of every 2-byte Latin
    * UTF-8 sequence misdecoded) and repaired by the inverse roundtrip:
    * re-encode as Latin-1, strictly re-decode as UTF-8. The repair is
    * attempted ONLY when indicators exist, applied ONLY when the roundtrip
    * is (a) Latin-1-encodable, (b) strictly valid UTF-8, and (c) reduces
    * the indicator count — so genuine "Ã" text survives untouched (the
    * strict decoder rejects C3+ASCII) and ASCII text never churns.
    * Single-pass repair by design: double-encoded mojibake repairs one
    * layer per run (matching one ftfy iteration).
    *
    * Scale shape: pure per-row typed kernel, zero shuffle; the corpus is
    * scanned once where it lives. */
  def mojibakeRepair(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t0) =>
        val t = if (t0 == null) "" else t0
        var ind = 0
        var latin1able = true
        var i = 0
        while (i < t.length) {
          val c = t.charAt(i)
          if (c == 'Ã') ind += 1
          if (c > 'ÿ') latin1able = false
          i += 1
        }
        val repaired: Option[String] =
          if (ind == 0 || !latin1able) None
          else {
            val bytes = t.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
            val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
              .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
              .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
            try {
              val s = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
              if (s.count(_ == 'Ã') < ind) Some(s) else None
            } catch { case _: java.nio.charset.CharacterCodingException => None }
          }
        val out = repaired.getOrElse(t)
        (id, ind.toLong, repaired.isDefined, out.length.toLong, Dedup.md5Hex(out))
      }
      .toDF("doc_id", "n_indicators", "repaired", "n_chars", "clean_md5")
  }
}
