package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.spark.PageRow

/** hreflang alternate-link clustering — how multilingual corpora find
  * TRANSLATION SETS: pages declaring each other as language alternates
  * (<link rel="alternate" hreflang=… href=…>) form one cluster, the unit
  * a parallel-text miner or a dedup-across-languages pass works on.
  * Cluster key = md5 of the page's sorted alternate-url set (self link
  * included, per the hreflang spec's self-referential requirement), so
  * mutually-consistent pages agree on the key WITHOUT any join — the
  * clustering is one narrow parse + one rollup. */
object Hreflang {

  final case class AltLink(url: String, hreflang: String, href: String)

  /** Scan head <link> tags for rel=alternate hreflang entries. Real
    * scanner discipline: comments skipped, attribute order free, both
    * quote styles; stops at </head> (body links are not hreflang
    * declarations). */
  def extractAlternates(html: String, pageUrl: String): Vector[AltLink] = {
    if (html == null) return Vector.empty
    // case-insensitive search on the ORIGINAL string — lowercasing a copy
    // can change string length (Turkish İ → "i̇"), misaligning the index
    val m = java.util.regex.Pattern
      .compile("</head", java.util.regex.Pattern.CASE_INSENSITIVE)
      .matcher(html)
    val headEnd = if (m.find()) m.start() else html.length
    val out = Vector.newBuilder[AltLink]
    var i = 0
    while (i < headEnd) {
      val lt = html.indexOf('<', i)
      if (lt < 0 || lt >= headEnd) { i = headEnd }
      else if (html.startsWith("<!--", lt)) {
        val end = html.indexOf("-->", lt + 4)
        i = if (end < 0) headEnd else end + 3
      } else {
        val gt = html.indexOf('>', lt)
        if (gt < 0) { i = headEnd }
        else {
          val tag = html.substring(lt + 1, gt)
          val name = tag.takeWhile(_.isLetter).toLowerCase(java.util.Locale.ROOT)
          if (name == "link") {
            def attr(k: String): String = {
              val m = (s"""(?i)\\b$k\\s*=\\s*("([^"]*)"|'([^']*)')""").r
                .findFirstMatchIn(tag)
              m.map(g => Option(g.group(2)).getOrElse(g.group(3))).getOrElse("")
            }
            if (attr("rel").equalsIgnoreCase("alternate") && attr("hreflang").nonEmpty)
              out += AltLink(pageUrl,
                attr("hreflang").toLowerCase(java.util.Locale.ROOT), attr("href"))
          }
          i = gt + 1
        }
      }
    }
    out.result()
  }

  /** Per-page translation-cluster assignment + the cluster rollup:
    * (cluster_key, n_pages, langs_csv). Shuffle carries (16-byte key,
    * lang) pairs only. */
  def clusters(pages: Dataset[PageRow]): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.flatMap { p =>
      val alts = extractAlternates(
        if (p.html == null) null
        else new String(p.html, java.nio.charset.StandardCharsets.UTF_8), p.url)
      if (alts.isEmpty) Iterator.empty
      else {
        val key = java.security.MessageDigest.getInstance("MD5")
          .digest(alts.map(_.href).distinct.sorted.mkString("\n")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          .map(x => f"$x%02x").mkString
        // no exact self-referential link → no lang claim; emit null so
        // collect_set skips it instead of polluting langs_csv with ""
        val self = alts.find(_.href == p.url).map(_.hreflang).orNull
        Iterator.single((key, self))
      }
    }
      .toDF("cluster_key", "lang")
      .groupBy("cluster_key")
      .agg(count(lit(1)).as("n_pages"),
           array_join(array_sort(collect_set(col("lang"))), ",").as("langs_csv"))
  }

  /** Deterministic multilingual synthesis: groups of three translations
    * (en/de/fr) cross-declaring each other with attribute-order and
    * quote-style variance plus a commented-out decoy link. Mirrored in
    * the DuckDB oracle. */
  def synthMultilingual(spark: org.apache.spark.sql.SparkSession, nGroups: Int): Dataset[PageRow] = {
    import spark.implicits._
    val langs = Vector("en", "de", "fr")
    spark.range(nGroups.toLong * 3).map { i =>
      val g = i / 3
      val lang = langs((i % 3).toInt)
      val urls = langs.map(l => s"https://t.example/$g/$l")
      val links = Seq(
        s"""<link rel="alternate" hreflang="en" href="${urls(0)}">""",
        s"""<link href='${urls(1)}' hreflang='de' rel='alternate'>""",
        s"""<link HREFLANG="fr" REL="alternate" HREF="${urls(2)}">""").mkString
      val html = s"<html><head><!-- <link rel=\"alternate\" hreflang=\"xx\" " +
        s"href=\"https://decoy.example/\"> -->$links</head>" +
        s"<body><p>$lang body $g</p></body></html>"
      PageRow(s"https://t.example/$g/$lang",
        new java.sql.Timestamp(1704067200000L + i * 1000L),
        html.getBytes(java.nio.charset.StandardCharsets.UTF_8), null, lang)
    }
  }
}
