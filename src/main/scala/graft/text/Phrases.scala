package graft.text

/** Phrase (token-window) generation with synonym/alternate expansion —
  * exact port of the reference's for_each_phrase / get_sorted_phrases
  * (/root/reference/include/adr/normalize.h:90-190). Goldens:
  * /root/reference/test/simple_test.cc:49-102.
  */
object Phrases {

  /** token_bits: bit i set for every absolute token index i in [from,to). */
  final case class Phrase(tokenBits: Int, s: String)

  final val MaxInputPhrases = 32 // types.h:143
  final val MaxWindow = 4 // for_each_phrase len != 5

  /** normalize.h:108-117 — exact alternates. */
  val exactAlts: Map[String, String] = Map(
    "hbf" -> "hauptbahnhof",
    "hauptbahnhof" -> "hbf",
    "hauptbf" -> "hbf",
    "bahnhof" -> "bhf",
    "bhf" -> "bahnhof"
  )

  /** normalize.h:90-106 — postfix alternates, checked in declaration order;
    * the match must be a suffix; replacement swaps the suffix. */
  private val postfixAlts: Vector[(String, String)] = Vector(
    "str" -> "strasse",
    "str." -> "strasse",
    "strasse" -> "str."
  )

  def exactAlt(s: String): Option[String] = exactAlts.get(s)

  def postfixAlt(s: String): Option[(String, String)] =
    postfixAlts.find { case (suffix, _) => s.endsWith(suffix) }

  /** normalize.h:119-134 — append the (single) alternate of `s` to `out`,
    * returning true if one exists. NOTE: the reference appends the alt
    * directly with no separating space even mid-phrase — bug-compatible. */
  private def appendAltString(s: String, out: java.lang.StringBuilder): Boolean =
    exactAlt(s) match {
      case Some(alt) => out.append(alt); true
      case None =>
        postfixAlt(s) match {
          case Some((suffix, replacement)) =>
            out.append(s, 0, s.length - suffix.length)
            out.append(replacement)
            true
          case None => false
        }
    }

  /** normalize.h:136-175 — emit every contiguous token window of length
    * 1..4, with recursive alternate expansion; alternates emit *before*
    * the original continuation (generation order matters: the final sort
    * is stable). */
  def forEachPhrase(tokens: IndexedSeq[String])(fn: (Int, String) => Unit): Unit = {
    val mem = new java.lang.StringBuilder
    var from = 0
    while (from < tokens.length) {
      var len = 1
      while (from + len <= tokens.length && len != MaxWindow + 1) {
        val to = from + len
        var tokenBits = 0
        var i = from
        while (i < to) { tokenBits |= 1 << i; i += 1 }

        def appendUntilEnd(tokenIdx: Int): Unit = {
          val oldSize = mem.length
          var i = tokenIdx
          while (i < to) {
            val prefixSize = mem.length
            val token = tokens(i)
            if (appendAltString(token, mem)) appendUntilEnd(i + 1)
            mem.setLength(prefixSize)
            if (mem.length > 0) mem.append(' ')
            mem.append(token)
            i += 1
          }
          fn(tokenBits, mem.toString)
          mem.setLength(oldSize)
        }

        appendUntilEnd(from)
        mem.setLength(0)
        len += 1
      }
      from += 1
    }
  }

  /** normalize.h:177-190 — all phrases, stable-sorted by string length
    * descending, capped at 32. */
  def sortedPhrases(tokens: IndexedSeq[String]): Vector[Phrase] = {
    val buf = Vector.newBuilder[Phrase]
    forEachPhrase(tokens)((bits, s) => buf += Phrase(bits, s))
    buf.result().sortBy(p => -p.s.length).take(MaxInputPhrases)
  }

  /** Bitmask rendering used by the reference tests (normalize.h:82-88):
    * LSB-first 8 chars. */
  def bitMaskToStr(b: Int): String =
    (0 until 8).map(i => if (((b >> i) & 1) == 1) '1' else '0').mkString
}
