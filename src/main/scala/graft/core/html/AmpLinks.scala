package graft.core.html

/** AMP ↔ canonical page pairing — the duplicate-surface detection a web
  * corpus needs before counting mobile AMP mirrors as independent
  * documents. The AMP spec requires a bidirectional link discipline: the
  * canonical page declares `<link rel="amphtml" href=…>`, the AMP page
  * declares `<html amp>` (or `⚡`) plus `<link rel="canonical" href=…>`.
  * Scanning both sides lets the pipeline join the pair and keep exactly
  * one representative (plus flag one-sided declarations, which are real
  * and common — a canonical that points at a dead AMP, an orphan AMP).
  */
object AmpLinks {

  final case class Info(isAmp: Boolean,
                        canonical: Option[String],
                        amphtml: Option[String])

  def scan(html: String): Info = {
    val lower = html.toLowerCase(java.util.Locale.ROOT)
    val isAmp = {
      val h = lower.indexOf("<html")
      val end = if (h >= 0) lower.indexOf('>', h) else -1
      end > 0 && {
        val body = html.substring(h + 1, end)
        HtmlExtract.attr(body, "amp").isDefined ||
        HtmlExtract.attr(body, "⚡").isDefined
      }
    }
    var canonical: Option[String] = None
    var amphtml: Option[String] = None
    var i = 0
    var more = true
    while (more) {
      i = lower.indexOf("<link", i)
      if (i < 0) more = false
      else {
        val end = lower.indexOf('>', i)
        if (end < 0) more = false
        else {
          val body = html.substring(i + 1, end)
          val rel = HtmlExtract.attr(body, "rel")
            .map(_.trim.toLowerCase(java.util.Locale.ROOT))
          val href = HtmlExtract.attr(body, "href").map(_.trim).filter(_.nonEmpty)
          rel match {
            case Some("canonical") if canonical.isEmpty => canonical = href
            case Some("amphtml") if amphtml.isEmpty => amphtml = href
            case _ =>
          }
          i = end + 1
        }
      }
    }
    Info(isAmp, canonical, amphtml)
  }
}
