package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Code-corpus curation operators (The-Stack-style source-file pipelines):
  * language identification (extension → shebang → keyword evidence),
  * SLOC/comment/blank accounting with block-comment state, and a
  * minified-file gate. All per-row and shuffle-free — the narrow shape that
  * holds at any corpus size; langId and the minified gate are pure
  * length/replace/regexp arithmetic with full DuckDB SQL replays, the SLOC
  * state machine is a typed kernel with a hand-counted pinned oracle. */
object CodeStats {

  /** Deterministic inline corpus: 10 files covering extension-mapped,
    * shebang-routed, keyword-fallback, minified, prose, and data cases.
    * Newlines are the only non-printable; the DuckDB oracle rebuilds the
    * identical bytes via replace('|', chr(10)) on pipe-encoded literals. */
  def codeCorpus(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val minified = "function f(){" + "var a0=1;" * 70 + "}"
    Seq(
      ("a/util.py",
        "#!/usr/bin/env python\n# helper\n\ndef add(a, b):\n    return a + b\n"),
      ("web/app.js",
        "// entry\nfunction main() {\n  var x = 1; /* init\n     block */\n  return x;\n}\n"),
      ("lib/vec.c",
        "#include <stdio.h>\n/* dot product */\nint dot(int a, int b) { return a * b; }\n"),
      ("run", "#!/bin/sh\necho start\n"),
      ("tool", "#!/usr/bin/env python3\nprint(1)\n"),
      ("web/min.js", minified),
      ("notes.txt", "just some plain prose notes about the build\n"),
      ("data/cfg.json", "{ \"k\": 1, \"n\": [1, 2, 3] }\n"),
      ("core/Main.scala",
        "object Main {\n  // entry\n  def main(args: Array[String]): Unit = println(42)\n}\n"),
      ("x/unknown.zzz", "def mystery():\n    return 7\n")
    ).toDF("path", "content")
  }

  /** Language ID, cheapest-evidence-first: (1) extension map, (2) shebang
    * interpreter, (3) keyword evidence, else unknown. Pure CASE +
    * regexp_extract — identical RE2/Java semantics for the classes used,
    * so the oracle replays the whole decision in SQL. */
  def langId(files: DataFrame): DataFrame =
    files
      .withColumn("ext",
        lower(regexp_extract(col("path"), "\\.([a-zA-Z0-9]+)$", 1)))
      .withColumn("shebang",
        regexp_extract(col("content"),
          "^#!\\S*[ /](python|bash|sh|node|perl|ruby)", 1))
      .withColumn("lang",
        when(col("ext") === "py", "python")
          .when(col("ext") === "js", "javascript")
          .when(col("ext") === "c", "c")
          .when(col("ext") === "scala", "scala")
          .when(col("ext") === "java", "java")
          .when(col("ext") === "json", "json")
          .when(col("ext") === "txt", "text")
          .when(col("shebang") === "python", "python")
          .when(col("shebang").isin("bash", "sh"), "shell")
          .when(col("shebang") === "node", "javascript")
          .when(col("shebang") === "perl", "perl")
          .when(col("shebang") === "ruby", "ruby")
          .when(col("content").rlike("\\bdef "), "python")
          .when(col("content").rlike("\\bfunction |\\bvar "), "javascript")
          .when(col("content").contains("#include"), "c")
          .otherwise("unknown"))
      .select(col("path"), col("ext"), col("shebang"), col("lang"))

  /** Minified-source gate: single-line bundles and whitespace-stripped
    * payloads — avg line length over 200, or a 500+-char line with under
    * 10% whitespace. Occurrence arithmetic only (no split-explode): line
    * count from newline occurrences, whitespace from replace deltas; the
    * max line length is the one list op, over a per-row bounded list. */
  def minifiedGate(files: DataFrame): DataFrame =
    files
      .withColumn("len", length(col("content")).cast("long"))
      .withColumn("n_nl", (length(col("content")) -
        length(regexp_replace(col("content"), "\n", ""))).cast("long"))
      .withColumn("n_lines",
        (col("n_nl") + when(col("content").endsWith("\n"), 0L)
          .otherwise(1L)).cast("long"))
      .withColumn("max_line_len", expr(
        "CAST(array_max(transform(split(content, '\n'), x -> length(x))) AS BIGINT)"))
      .withColumn("ws", (length(col("content")) - length(
        translate(col("content"), " \n\t", ""))).cast("long"))
      .withColumn("avg_line_len", expr("len div greatest(n_lines, 1)"))
      .withColumn("ws_pm", expr("ws * 1000 div greatest(len, 1)"))
      .withColumn("minified",
        col("avg_line_len") > 200 ||
          (col("max_line_len") > 500 && col("ws_pm") < 100))
      .select(col("path"), col("n_lines"), col("max_line_len"),
        col("avg_line_len"), col("ws_pm"), col("minified"))

  /** SLOC accounting with block-comment state. Line classes, in order:
    * blank (trim-empty); inside an open slash-star block → comment (a
    * line containing the closer is still wholly a comment — documented
    * simplification); line-start markers `# ` `#!` bare `#` `//` or a
    * slash-star opener → comment (note `#include` is NOT a comment: `#`
    * only counts bare or
    * followed by space/`!`); otherwise code, and a trailing unclosed
    * `slash-star` on a code line opens the block. Per-row typed kernel —
    * data-dependent loop, narrow plan, no shuffle. */
  def slocStats(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col("path"), col("content")).as[(String, String)]
      .map { case (path, content) =>
        val raw = content.split("\n", -1)
        val lines = if (raw.nonEmpty && raw.last.isEmpty) raw.dropRight(1) else raw
        var inBlock = false
        var nBlank = 0L; var nComment = 0L; var nCode = 0L
        lines.foreach { line =>
          val t = line.trim
          if (t.isEmpty) nBlank += 1
          else if (inBlock) {
            nComment += 1
            if (t.contains("*/")) inBlock = false
          } else if (t == "#" || t.startsWith("# ") || t.startsWith("#!") ||
            t.startsWith("//")) nComment += 1
          else if (t.startsWith("/*")) {
            nComment += 1
            if (!t.substring(2).contains("*/")) inBlock = true
          } else {
            nCode += 1
            val open = t.lastIndexOf("/*")
            if (open >= 0 && !t.substring(open + 2).contains("*/")) inBlock = true
          }
        }
        (path, lines.length.toLong, nBlank, nComment, nCode)
      }
      .toDF("path", "n_lines", "n_blank", "n_comment", "n_sloc")
  }
}
