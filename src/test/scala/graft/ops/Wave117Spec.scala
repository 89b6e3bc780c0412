package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 117: code-corpus curation — language ID, minified gate, SLOC. */
class Wave117Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark
  import org.apache.spark.sql.functions.col

  private def files(rows: (String, String)*) = {
    import spark.implicits._
    rows.toDF("path", "content")
  }

  test("langId: fixture corpus routes ext/shebang/keyword correctly") {
    val out = CodeStats.langId(CodeStats.codeCorpus(spark)).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(out == Map(
      "a/util.py" -> "python", "web/app.js" -> "javascript",
      "lib/vec.c" -> "c", "run" -> "shell", "tool" -> "python",
      "web/min.js" -> "javascript", "notes.txt" -> "text",
      "data/cfg.json" -> "json", "core/Main.scala" -> "scala",
      "x/unknown.zzz" -> "python"))
  }

  test("langId: bash/node/ruby shebangs and js keyword fallback") {
    val out = CodeStats.langId(files(
      ("deploy", "#!/bin/bash\nset -e\n"),
      ("serve", "#!/usr/bin/env node\nconsole.log(1)\n"),
      ("gemtool", "#!/usr/bin/ruby\nputs 1\n"),
      ("blob", "var x = 1\nx = x + 1\n"),
      ("mystery", "some plain words with no evidence at all\n")))
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(out == Map("deploy" -> "shell", "serve" -> "javascript",
      "gemtool" -> "ruby", "blob" -> "javascript", "mystery" -> "unknown"))
  }

  test("minifiedGate: avg boundary at 200 and fixture minified line") {
    // 201 chars, 1 line, no trailing newline → avg 201 > 200 → minified;
    // 200 chars → not
    val rows = CodeStats.minifiedGate(files(
      ("a.js", "x" * 201), ("b.js", "x" * 200),
      ("c.js", ("y" * 600) + "\nshort line\n")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    assert(rows("a.js") == ((201L, 0L, true)))
    assert(rows("b.js") == ((200L, 0L, false)))
    // c.js: len 612, 2 lines → avg 306 > 200 → minified anyway
    assert(rows("c.js")._3)
    val fx = CodeStats.minifiedGate(CodeStats.codeCorpus(spark))
      .where(col("path") === "web/min.js").collect().head
    assert(fx.getLong(1) == 1L && fx.getLong(2) == 644L &&
      fx.getLong(3) == 644L && fx.getLong(4) == 110L && fx.getBoolean(5))
    // and the prose file is not flagged
    val prose = CodeStats.minifiedGate(CodeStats.codeCorpus(spark))
      .where(col("path") === "notes.txt").collect().head
    assert(!prose.getBoolean(5))
  }

  test("slocStats: block-comment state machine over multi-line blocks") {
    val content =
      "int main() {\n" +      // code
      "  /* a block\n" +      // comment, opens
      "     still inside\n" + // comment
      "     done */\n" +      // comment, closes
      "  int x = 1; /* tail\n" + // code, reopens
      "     closing */\n" +   // comment, closes
      "  return x;\n" +       // code
      "}\n"                   // code
    val r = CodeStats.slocStats(files(("m.c", content))).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((8L, 0L, 4L, 4L)))
  }

  test("slocStats: # rules — shebang/bare/spaced are comments, #include is code") {
    val content = "#!/bin/sh\n#\n# note\n#include <x.h>\n#define Y 2\n"
    val r = CodeStats.slocStats(files(("h.c", content))).collect().head
    // comments: shebang, bare #, "# note"; code: #include, #define
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((5L, 0L, 3L, 2L)))
  }

  test("slocStats: fixture corpus matches the hand-counted oracle rows") {
    val out = CodeStats.slocStats(CodeStats.codeCorpus(spark)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(out == Set(
      ("a/util.py", 5L, 1L, 2L, 2L), ("web/app.js", 6L, 0L, 2L, 4L),
      ("lib/vec.c", 3L, 0L, 1L, 2L), ("run", 2L, 0L, 1L, 1L),
      ("tool", 2L, 0L, 1L, 1L), ("web/min.js", 1L, 0L, 0L, 1L),
      ("notes.txt", 1L, 0L, 0L, 1L), ("data/cfg.json", 1L, 0L, 0L, 1L),
      ("core/Main.scala", 4L, 0L, 1L, 3L), ("x/unknown.zzz", 2L, 0L, 0L, 2L)))
  }
}
