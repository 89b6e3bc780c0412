package graft.core

/** Executor-wide cache of parsed embedded font programs, keyed by content
  * hash. Web corpora repeat the same generator fonts across millions of
  * documents (every LibreOffice/Scribus export ships the same subset
  * families), so table parsing amortizes to ~zero — the same
  * open-once-per-worker amortization lesson the reference applies to
  * documents (render.py:372-383), applied one level down.
  *
  * Lock-free reads: every task thread hits this on every document, so a
  * synchronized LRU would serialize the hot path at high core counts.
  * ConcurrentHashMap + clear-on-overflow keeps the bound without a global
  * lock (a rare full refill is far cheaper than per-doc lock traffic). */
object FontCache {

  private val MaxEntries = 512

  private val sha1 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("SHA-1"))

  private def key(bytes: Array[Byte]): String = {
    val md = sha1.get()
    md.reset()
    val d = md.digest(bytes)
    java.util.Base64.getEncoder.encodeToString(d) + ":" + bytes.length
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[TrueTypeFont]](256)

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
    if (cache.size >= MaxEntries) cache.clear()
    cache.put(k, parsed)
    parsed
  }

  // classic Type1 programs repeat across same-generator documents too
  private val type1Cache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[Type1Font]](64)

  def type1(rawStream: Array[Byte], decode: () => Array[Byte],
            len1: Int, len2: Int): Option[Type1Font] = {
    if (rawStream.length < 8) return None
    val k = key(rawStream)
    val hit = type1Cache.get(k)
    if (hit != null) return hit
    val parsed =
      try Type1Font.parse(decode(), len1, len2)
      catch { case _: Exception => None }
    if (type1Cache.size >= MaxEntries) type1Cache.clear()
    type1Cache.put(k, parsed)
    parsed
  }

  private val cffCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[CffFont]](64)

  def cff(rawStream: Array[Byte], decode: () => Array[Byte]): Option[CffFont] = {
    if (rawStream.length < 8) return None
    val k = key(rawStream)
    val hit = cffCache.get(k)
    if (hit != null) return hit
    val parsed =
      try CffFont.parse(decode())
      catch { case _: Exception => None }
    if (cffCache.size >= MaxEntries) cffCache.clear()
    cffCache.put(k, parsed)
    parsed
  }

  // ToUnicode CMaps repeat identically across same-generator documents too
  private val cmapCache =
    new java.util.concurrent.ConcurrentHashMap[String, Map[Int, String]](256)

  def toUnicode(rawStream: Array[Byte], decode: () => Array[Byte]): Map[Int, String] = {
    val k = key(rawStream)
    val hit = cmapCache.get(k)
    if (hit != null) return hit
    val parsed =
      try CMapParser.parseToUnicode(decode())
      catch { case _: Exception => Map.empty[Int, String] }
    if (cmapCache.size >= MaxEntries) cmapCache.clear()
    cmapCache.put(k, parsed)
    parsed
  }
}
