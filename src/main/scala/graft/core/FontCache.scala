package graft.core

/** Executor-wide cache of parsed embedded font programs, keyed by content
  * hash. Web corpora repeat the same generator fonts across millions of
  * documents (every LibreOffice/Scribus export ships the same subset
  * families), so table parsing amortizes to ~zero — the same
  * open-once-per-worker amortization lesson the reference applies to
  * documents (render.py:372-383), applied one level down. Bounded LRU;
  * thread-safe (parsing runs on every task thread). */
object FontCache {

  private val MaxEntries = 256

  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, Option[TrueTypeFont]](64, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[String, Option[TrueTypeFont]]): Boolean =
        size() > MaxEntries
    })

  private def key(bytes: Array[Byte]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    val d = md.digest(bytes)
    java.util.Base64.getEncoder.encodeToString(d) + ":" + bytes.length
  }

  /** Keyed on the RAW (still compressed) stream bytes so the cache also
    * absorbs the FlateDecode of the font program — the dominant repeated
    * cost (a LibreOffice subset font inflates ~370 KB per document). */
  def trueType(rawStream: Array[Byte], decode: () => Array[Byte]): Option[TrueTypeFont] = {
    if (rawStream.length < 12) return None
    val k = key(rawStream)
    val hit = cache.get(k)
    if (hit != null) return hit
    val parsed =
      try TrueTypeFont.parse(decode())
      catch { case _: Exception => None }
    cache.put(k, parsed)
    parsed
  }

  // ToUnicode CMaps repeat identically across same-generator documents too
  private val cmapCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, Map[Int, String]](64, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[String, Map[Int, String]]): Boolean =
        size() > MaxEntries
    })

  def toUnicode(rawStream: Array[Byte], decode: () => Array[Byte]): Map[Int, String] = {
    val k = key(rawStream)
    val hit = cmapCache.get(k)
    if (hit != null) return hit
    val parsed =
      try CMapParser.parseToUnicode(decode())
      catch { case _: Exception => Map.empty[Int, String] }
    cmapCache.put(k, parsed)
    parsed
  }
}
