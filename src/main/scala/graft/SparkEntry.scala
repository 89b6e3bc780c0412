package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.spark.{ExtractPipeline, PageRow, PagesTable}
import graft.ops.{Dedup, Similarity, TextStats}

/** Driver contract — one `queries` entry per implemented operator
  * (SURVEY.md §2), each with a DuckDB oracle where SQL-expressible.
  *
  * Two query families:
  *  - `pdf_*`: run the extraction engine over a deterministic pages table
  *    synthesized from the reference fixture corpus; oracles are literal
  *    VALUES pinned to the reference goldens (tests/expectations and
  *    tests/test_ literals) — independent of this implementation.
  *  - relational / `dedup_*` / `ann_*` / `text_*`: run on the driver's
  *    parquet tables in sfDir; oracles are equivalent DuckDB SQL.
  */
object SparkEntry {

  private def docs(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship: full extraction pipeline over a synthesized skewed corpus. */
  def entry(spark: SparkSession): DataFrame = {
    val pages = PagesTable.synthesize(spark, 200, 8)
    ExtractPipeline.extract(pages).toDF()
  }

  // fixture sets used by pdf_* queries
  private val TextualFixtures = Seq("text.pdf", "multipage.pdf", "empty.pdf")
  private val AllFixtures = Seq(
    "text.pdf", "multipage.pdf", "empty.pdf", "attachments.pdf", "forms.pdf",
    "images.pdf", "render.pdf", "box_fallback.pdf", "toc.pdf",
    "toc_viewmodes.pdf", "toc_maxdepth.pdf", "toc_circular.pdf")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- extraction engine (SURVEY.md §2.1/2.2, north-star op) ----------
    "pdf_extract_text" -> ((s, _) => {
      val pages = PagesTable.ofFixtures(s, TextualFixtures)
      ExtractPipeline.extract(pages)
        .select(col("url"), col("ok"), col("n_pages").cast("long").as("n_pages"),
          col("n_chars"), col("text"))
        .orderBy("url")
    }),

    "pdf_extract_encrypted" -> ((s, _) => {
      import s.implicits._
      // password matrix: user / owner / wrong / none (test_document.py:106-146)
      val rows = Seq("test_user", "test_owner", "wrong_password", "").map { pwd =>
        val res = graft.core.Extract.extractText(PagesTable.fixture("encrypted.pdf"), pwd)
        (if (pwd.isEmpty) "<none>" else pwd, res.ok, res.errCode,
          res.pages.headOption.map(_.text).getOrElse(""))
      }
      // tiny driver-side matrix (4 rows) — parallelized for schema fidelity
      s.createDataset(rows).toDF("password", "ok", "err_code", "text")
    }),

    "pdf_page_count" -> ((s, _) => {
      val pages = PagesTable.ofFixtures(s, AllFixtures)
      ExtractPipeline.extract(pages)
        .select(col("url"), col("ok"), col("n_pages").cast("long").as("n_pages"))
        .orderBy("url")
    }),

    "pdf_metadata" -> ((s, _) => {
      import s.implicits._
      val keys = Seq("Title", "Author", "Subject", "Keywords", "Creator", "Producer", "CreationDate", "ModDate")
      val rows = Seq("multipage.pdf", "empty.pdf").flatMap { f =>
        graft.core.PdfDocument.load(PagesTable.fixture(f)).toOption.toSeq.flatMap { d =>
          val m = d.metadata()
          keys.map(k => (f, k, m.getOrElse(k, "")))
        }
      }
      s.createDataset(rows).toDF("fixture", "key", "value")
    }),

    "pdf_version_ids" -> ((s, _) => {
      import s.implicits._
      val rows = Seq("text.pdf", "multipage.pdf", "empty.pdf").flatMap { f =>
        graft.core.PdfDocument.load(PagesTable.fixture(f)).toOption.map { d =>
          val (idp, idc) = d.identifiers
          // the reference's get_identifier slices [:n_bytes-2], observably
          // dropping the ID's last byte (document.py:278-292; literal at
          // tests/test_document.py:153-154) — mirror that here
          def hex(b: Array[Byte]) = b.dropRight(1).map(x => f"$x%02X").mkString
          (f, d.version.toLong, hex(idp), hex(idc), d.isTagged, d.pageMode, d.formType)
        }
      }
      s.createDataset(rows).toDF("fixture", "version", "id_permanent", "id_changing", "tagged", "page_mode", "form_type")
    }),

    "pdf_boxes" -> ((s, _) => {
      import s.implicits._
      val rows = Seq("multipage.pdf", "box_fallback.pdf").flatMap { f =>
        graft.core.PdfDocument.load(PagesTable.fixture(f)).toOption.toSeq.flatMap { d =>
          d.pages.zipWithIndex.map { case (p, i) =>
            def r4(v: Double) = math.round(v * 10000).toDouble / 10000
            (f, i.toLong, r4(p.width), r4(p.height), p.rotation.toLong,
              r4(p.mediaBox.left), r4(p.mediaBox.bottom), r4(p.mediaBox.right), r4(p.mediaBox.top),
              r4(p.cropBox.right), r4(p.bbox.top))
          }
        }
      }
      s.createDataset(rows).toDF("fixture", "page", "width", "height", "rotation",
        "media_l", "media_b", "media_r", "media_t", "crop_r", "bbox_t")
    }),

    "pdf_toc" -> ((s, _) => {
      import s.implicits._
      val rows = graft.core.PdfDocument.load(PagesTable.fixture("toc.pdf")).toOption.toSeq.flatMap { d =>
        d.toc().zipWithIndex.map { case (bm, i) =>
          val dest = bm.dest
          def r0(v: Option[Double]) = v.map(x => math.round(x).toDouble).getOrElse(-1.0)
          (i.toLong, bm.level.toLong, bm.title, bm.count.toLong,
            dest.map(_.pageIndex.toLong).getOrElse(-1L),
            dest.map(_.viewMode).getOrElse(""),
            r0(dest.flatMap(_.params.lift(0).flatten)),
            r0(dest.flatMap(_.params.lift(1).flatten)))
        }
      }
      s.createDataset(rows).toDF("ord", "level", "title", "count", "page_index", "view", "px", "py")
    }),

    "pdf_toc_bounded" -> ((s, _) => {
      import s.implicits._
      // max_depth bound + circular-chain cut (document.py:530-557)
      val rows = Seq(
        ("toc_maxdepth.pdf", 4), ("toc_maxdepth.pdf", 8), ("toc_circular.pdf", 15))
        .flatMap { case (f, depth) =>
          graft.core.PdfDocument.load(PagesTable.fixture(f)).toOption.map { d =>
            val t = d.toc(maxDepth = depth)
            (f, depth.toLong, t.length.toLong, t.map(_.level).maxOption.getOrElse(-1).toLong)
          }
        }
      s.createDataset(rows).toDF("fixture", "max_depth", "n_bookmarks", "max_level")
    }),

    "pdf_attachments" -> ((s, _) => {
      import s.implicits._
      val rows = graft.core.PdfDocument.load(PagesTable.fixture("attachments.pdf")).toOption.toSeq.flatMap { d =>
        d.attachments.zipWithIndex.map { case (a, i) =>
          (i.toLong + 1, a.name, a.data.length.toLong)
        }
      }
      s.createDataset(rows).toDF("ord", "name", "n_bytes")
    }),

    "pdf_page_labels" -> ((s, _) => {
      import s.implicits._
      val rows = graft.core.PdfDocument.load(PagesTable.fixture("toc_viewmodes.pdf")).toOption.toSeq.flatMap { d =>
        (0 until d.pageCount).map(i => (i.toLong, d.pageLabel(i)))
      }
      s.createDataset(rows).toDF("page", "label")
    }),

    "pdf_search" -> ((s, _) => {
      import s.implicits._
      val rows = graft.core.PdfDocument.load(PagesTable.fixture("text.pdf")).toOption.toSeq.flatMap { d =>
        val tp = d.page(0).textPage
        tp.search("labor").zipWithIndex.map { case ((idx, cnt), i) =>
          (i.toLong, idx.toLong, cnt.toLong)
        }
      }
      s.createDataset(rows).toDF("ord", "char_index", "length")
    }),

    "pdf_rects_chars" -> ((s, _) => {
      import s.implicits._
      val rows = graft.core.PdfDocument.load(PagesTable.fixture("text.pdf")).toOption.toSeq.map { d =>
        val tp = d.page(0).textPage
        val rs = tp.rects()
        val first = rs.head
        (tp.countChars.toLong, rs.length.toLong,
          math.round(first.left), math.round(first.bottom),
          math.round(first.right), math.round(first.top),
          tp.textBounded(Some(first.left), Some(first.bottom), Some(first.right), Some(first.top)))
      }
      s.createDataset(rows).toDF("n_chars", "n_rects", "r_left", "r_bottom", "r_right", "r_top", "first_rect_text")
    }),

    "pdf_images" -> ((s, _) => {
      import s.implicits._
      // multimodal metadata: image objects with typed metadata columns
      // (golden tests/expectations/pageobjects_images.txt)
      val rows = graft.core.PdfDocument.load(PagesTable.fixture("images.pdf")).toOption.toSeq.flatMap { d =>
        d.page(0).objects(Set("image")).zipWithIndex.map { case (o, i) =>
          def r2(v: Double) = math.round(v * 100).toDouble / 100
          (i.toLong + 1, o.imgWidth.toLong, o.imgHeight.toLong, o.imgBpc.toLong,
            o.imgColorspace, o.imgFilters.mkString(","),
            r2(o.bounds.left), r2(o.bounds.bottom), r2(o.bounds.right), r2(o.bounds.top))
        }
      }
      s.createDataset(rows).toDF("ord", "width", "height", "bpc", "colorspace", "filters", "l", "b", "r", "t")
    }),

    "pdf_objects_count" -> ((s, _) => {
      import s.implicits._
      val rows = Seq("images.pdf", "text.pdf", "render.pdf").flatMap { f =>
        graft.core.PdfDocument.load(PagesTable.fixture(f)).toOption.toSeq.flatMap { d =>
          d.page(0).objects().groupBy(_.objType).toSeq.map { case (t, os) => (f, t, os.length.toLong) }
        }
      }
      s.createDataset(rows).toDF("fixture", "obj_type", "cnt")
    }),

    "pdf_fonts_report" -> ((s, _) => {
      import s.implicits._
      // fonts report: group fonts by identity across pages, page-range
      // compression (reference fonts.py:60-77, _parsers.py:40-61)
      val rows = Seq("text.pdf", "multipage.pdf").flatMap { f =>
        graft.core.PdfDocument.load(PagesTable.fixture(f)).toOption.toSeq.flatMap { d =>
          d.pages.zipWithIndex.flatMap { case (p, i) =>
            graft.core.Reports.pageFonts(p).map { case (bn, fam, emb, w) =>
              (f, bn, fam, emb, w.toLong, i + 1)
            }
          }
        }
      }
      s.createDataset(rows).toDF("fixture", "font", "family", "embedded", "weight", "page")
        .groupBy("fixture", "font", "family", "embedded", "weight")
        .agg(sort_array(collect_set(col("page"))).as("pages"))
        .as[(String, String, String, Boolean, Long, Seq[Int])]
        .map { case (f, bn, fam, emb, w, pages) =>
          (f, bn, fam, emb, w, graft.core.Reports.rangeCompress(pages))
        }
        .toDF("fixture", "font", "family", "embedded", "weight", "pages")
        .orderBy("fixture", "font")
    }),

    "pdf_arrange" -> ((s, _) => {
      import s.implicits._
      // import_pages / arrange analog: page-range spec with duplicates and
      // order preserved (reference document.py:445-473, _parsers.py:10-28;
      // sequences tested at tests/test_document.py:220-236)
      val d = graft.core.PdfDocument.load(PagesTable.fixture("multipage.pdf")).toOption.get
      val idxs = graft.core.Reports.pageRanges("2,1-3,2", d.pageCount).toOption.get
      val perPage = d.pages.map(p => p.textPage.text.replace("\r\n", "\n"))
      val rows = idxs.zipWithIndex.map { case (src, newIdx) =>
        (newIdx.toLong, src.toLong, perPage(src))
      }
      s.createDataset(rows).toDF("new_idx", "src_page", "text")
    }),

    "pdf_payload_stats" -> ((s, _) => {
      // multimodal binary-column plumbing: magic, hash, JPEG header decode
      val pages = PagesTable.ofFixtures(s, Seq("text.pdf", "multipage.pdf", "mona_lisa.jpg", "empty.pdf"))
      graft.ops.Multimodal.payloadStats(pages).toDF().orderBy("url")
    }),

    "pdf_coords_roundtrip" -> ((s, _) => {
      import s.implicits._
      // device↔page transform round trip (reference tests/test_page.py:64-80)
      val d = graft.core.PdfDocument.load(PagesTable.fixture("text.pdf")).toOption.get
      val p = d.page(0)
      def r6(v: Double) = math.round(v * 1e6) / 1e6
      val pts = Seq((0.0, 0.0), (100.0, 200.0), (595.0, 841.0), (297.5, 420.5))
      val rows = pts.map { case (x, y) =>
        val (dx, dy) = graft.core.PageCoords.pageToDevice(p, 400, 600, x, y)
        val (rx, ry) = graft.core.PageCoords.deviceToPage(p, 400, 600, dx, dy)
        (x, y, r6(rx), r6(ry))
      }
      s.createDataset(rows).toDF("x", "y", "rt_x", "rt_y")
    }),

    "html_extract_main" -> ((s, _) => {
      import s.implicits._
      // HTML half of the extraction pipeline: boilerplate strip + DOM
      // heuristics over Common-Crawl-shaped html payloads
      def page(i: Int): String =
        s"""<html lang="en"><head><title>Doc $i</title><script>var x = 1 < 2;</script></head><body>""" +
          """<nav><a href="/">Home</a> <a href="/all">All pages listing here</a></nav>""" +
          s"""<main><p>Para one of document $i carries the primary payload sentence for extraction.</p>""" +
          s"""<p>Para two of document $i adds a second long sentence so the block filter passes.</p></main>""" +
          """<footer>Footer boilerplate text that is also long enough to form a block.</footer></body></html>"""
      val rows = (0 until 3).map { i =>
        PageRow(s"synthetic://html/$i", new java.sql.Timestamp(1704067200000L + i * 1000), page(i).getBytes("UTF-8"), null, "en")
      }
      val ds = s.createDataset(rows)
      ExtractPipeline.extract(ds)
        .select(col("url"), col("ok"), col("n_pages").cast("long").as("n_pages"),
          col("n_chars"), col("text"))
        .orderBy("url")
    }),

    "pdf_spans" -> ((s, _) => {
      // span/bbox structs per page (north-star output shape): line rects of
      // text.pdf page 0, rounded to ints — count and first rect are pinned
      // by the reference (10 rects; ≈(58,767,258,782); 56 < left < 59)
      val pages = PagesTable.ofFixtures(s, Seq("text.pdf"))
      ExtractPipeline.extractSpans(pages)
        .where(col("page_idx") === 0)
        .select(col("url"), col("n_chars"), explode(col("rects")).as("rect"))
        .select(col("url"), col("n_chars"),
          round(col("rect.l")).cast("long").as("l"), round(col("rect.b")).cast("long").as("b"),
          round(col("rect.r")).cast("long").as("r"), round(col("rect.t")).cast("long").as("t"))
        .orderBy(col("b").desc)
    }),

    "pdf_form_fields" -> ((s, _) => {
      import s.implicits._
      val rows = graft.core.PdfDocument.load(PagesTable.fixture("forms.pdf")).toOption.toSeq.flatMap { d =>
        d.formFields.zipWithIndex.map { case ((name, ft), i) => (i.toLong, name, ft, d.formType) }
      }
      s.createDataset(rows).toDF("ord", "name", "field_type", "form_type")
    }),

    "pdf_annotations" -> ((s, _) => {
      import s.implicits._
      // link harvesting: URI annots with rects (fixture text.pdf page 2)
      val rows = graft.core.PdfDocument.load(PagesTable.fixture("text.pdf")).toOption.toSeq.flatMap { d =>
        d.pages.zipWithIndex.flatMap { case (p, pi) =>
          p.annotationInfos.zipWithIndex.map { case ((sub, r, uri), ai) =>
            def r3(v: Double) = math.round(v * 1000).toDouble / 1000
            (pi.toLong, ai.toLong, sub, r3(r.left), r3(r.bottom), r3(r.right), r3(r.top), uri)
          }
        }
      }
      s.createDataset(rows).toDF("page", "ord", "subtype", "l", "b", "r", "t", "uri")
    }),

    "pdf_sql_surface" -> ((s, _) => {
      // ScalaUDF SQL registration (SURVEY.md §2.11): the parser callable
      // straight from spark.sql
      graft.functions.PdfFunctions.register(s)
      PagesTable.ofFixtures(s, Seq("text.pdf", "multipage.pdf", "empty.pdf"))
        .toDF().createOrReplaceTempView("pages_v")
      s.sql("""SELECT url, CAST(pdf_page_count(html) AS BIGINT) AS n_pages,
               |  pdf_char_count(html) AS n_chars, pdf_err_code(html) AS err_code
               |FROM pages_v ORDER BY url""".stripMargin)
    }),

    // ---- metrics / lineage (north-star requirement) ---------------------
    "extract_metrics" -> ((s, _) => {
      val pages = PagesTable.synthesize(s, 130, 8)
      val ext = ExtractPipeline.extract(pages, numPartitions = 8)
      ExtractPipeline.metrics(ext, "verify")
        .agg(sum(col("docs")).as("docs"), sum(col("pages")).as("pages"),
          sum(col("chars")).as("chars"), sum(col("decode_failures")).as("decode_failures"),
          countDistinct(col("partition_id")).as("n_partitions"))
    }),

    // ---- relational core (SURVEY.md §2.4; TPC-H-shaped) ------------------
    "q1_agg" -> ((s, dir) => {
      docs(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("cnt"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q_join_revenue" -> ((s, dir) => {
      val li = docs(s, dir, "lineitem")
      val o = docs(s, dir, "orders")
      val c = docs(s, dir, "customer")
      val n = docs(s, dir, "nation")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy("n_name")
    }),

    "q_window_topk" -> ((s, dir) => {
      val o = docs(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      o.withColumn("rk", row_number().over(w))
        .where(col("rk") <= 2)
        .select(col("o_custkey"), col("rk").cast("long").as("rk"), col("o_orderkey"))
        .where(col("o_custkey") < 100)
        .orderBy("o_custkey", "rk")
    }),

    "q_topk_global" -> ((s, dir) => {
      docs(s, dir, "lineitem")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"), col("l_extendedprice"))
        .limit(10)
    }),

    "q_rollup" -> ((s, dir) => {
      // rollup totals (SURVEY.md §2.4: pageobjects per-page + total counts)
      docs(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q_events_daily" -> ((s, dir) => {
      docs(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"), min(col("value")).as("min_v"), max(col("value")).as("max_v"))
        .where(col("cnt") > 1)
        .orderBy("event_type", "day")
    }),

    "q_set_ops" -> ((s, dir) => {
      // union/intersect/except semantics (SURVEY.md §2.7 import_pages analog)
      val c = docs(s, dir, "customer").select(col("c_nationkey").cast("int").as("k"))
      val sup = docs(s, dir, "supplier").select(col("s_nationkey").cast("int").as("k"))
      val inter = c.distinct().intersect(sup.distinct()).withColumn("op", lit("intersect"))
      val exc = c.distinct().except(sup.distinct()).withColumn("op", lit("except"))
      val uni = c.union(sup).distinct().withColumn("op", lit("union"))
      inter.unionByName(exc).unionByName(uni).orderBy("op", "k")
    }),

    // ---- dedup family ----------------------------------------------------
    "dedup_exact" -> ((s, dir) => {
      Dedup.exact(Dedup.corpusWithReplicas(docs(s, dir, "documents").select(col("doc_id"), col("text"))))
        .orderBy("h")
    }),

    "dedup_minhash_lsh" -> ((s, dir) => {
      Dedup.minhashLsh(Dedup.corpusWithReplicas(docs(s, dir, "documents").select(col("doc_id"), col("text"))))
        .orderBy("a", "b")
    }),

    "dedup_jaccard_block" -> ((s, dir) => {
      Dedup.jaccardBlocked(Dedup.corpusWithReplicas(docs(s, dir, "documents").select(col("doc_id"), col("text"))))
        .orderBy("a", "b")
    }),

    "dedup_simhash" -> ((s, dir) => {
      // no SQL oracle (bit-level sketch); rows-only check + ScalaTest coverage
      Dedup.simhashPairs(Dedup.corpusWithReplicas(docs(s, dir, "documents").select(col("doc_id"), col("text"))))
        .orderBy("a", "b")
    }),

    // ---- similarity search ----------------------------------------------
    "ann_cosine_topk" -> ((s, dir) => {
      Similarity.bruteForceTopK(docs(s, dir, "embeddings"), nQueries = 20, k = 3)
        .orderBy("vec_id", "rank")
    }),

    "ann_lsh_topk" -> ((s, dir) => {
      // scale path: LSH-bucketed; recall<1 by design → rows-only check
      Similarity.lshTopK(docs(s, dir, "embeddings"), nQueries = 20, k = 3)
        .orderBy("vec_id", "rank")
    }),

    // ---- text analysis ----------------------------------------------------
    "text_token_count" -> ((s, dir) => {
      TextStats.tokenCount(docs(s, dir, "documents")).orderBy("doc_id")
    }),

    "text_quality" -> ((s, dir) => {
      TextStats.quality(docs(s, dir, "documents")).orderBy("doc_id")
    }),

    "text_langid" -> ((s, dir) => {
      TextStats.langScores(docs(s, dir, "documents")).orderBy("doc_id")
    }),

    "text_fingerprint" -> ((s, dir) => {
      TextStats.fingerprint(docs(s, dir, "documents")).orderBy("doc_id")
    })
  )

  def oracleSql: Map[String, String] = OracleSql.all
}
