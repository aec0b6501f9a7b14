package graft.text

/** Canonical match key: normalized text with synonym/postfix alternates
  * expanded to a single canonical direction. The reference handles
  * alternates by *enumerating* phrase variants at query time
  * (normalize.h:90-134, get_suggestions.cc:650-655); for set-based
  * blocking and symmetric pair scoring we instead canonicalize both sides
  * to the long form — same alt table, one direction:
  * hbf/hauptbf → hauptbahnhof, bhf → bahnhof, *str/str. → *strasse.
  */
object MatchKeys {
  private val exactCanonical: Map[String, String] = Map(
    "hbf" -> "hauptbahnhof",
    "hauptbf" -> "hauptbahnhof",
    "bhf" -> "bahnhof")

  def canonicalToken(t: String): String =
    exactCanonical.get(t) match {
      case Some(c) => c
      case None =>
        if (t.endsWith("strasse")) t
        else if (t.endsWith("str")) t + "asse" // …str → …strasse (incl. "str")
        else if (t.endsWith("hbf") && !t.endsWith("hauptbahnhof"))
          t.substring(0, t.length - 3) + "hauptbahnhof" // fused …hbf → …hauptbahnhof
        else t
    }

  /** German digraph fold: ae→a, oe→o, ue→u (single left-to-right pass).
    * utf8proc normalization strips umlaut marks (ä→a) but leaves the
    * spelled-out digraph ("ae") untouched; folding both onto the same
    * bytes makes diacritic spell-outs key-identical to their stripped
    * forms. Match-key only — slightly lossy, never displayed. */
  def foldDigraphs(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (i + 1 < n && s.charAt(i + 1) == 'e' && (c == 'a' || c == 'o' || c == 'u')) {
        sb.append(c); i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** raw → canonical match key (normalize + fillers + digraph fold + alt
    * expansion). */
  def matchKey(raw: String): String = {
    if (raw == null) return null
    val canon = foldDigraphs(Normalize.canonical(raw))
    if (canon.isEmpty) return canon
    val out = new java.lang.StringBuilder(canon.length + 8)
    var i = 0
    val n = canon.length
    var first = true
    while (i < n) {
      while (i < n && canon.charAt(i) == ' ') i += 1
      val start = i
      while (i < n && canon.charAt(i) != ' ') i += 1
      if (i > start) {
        if (!first) out.append(' ')
        out.append(canonicalToken(canon.substring(start, i)))
        first = false
      }
    }
    out.toString
  }
}
