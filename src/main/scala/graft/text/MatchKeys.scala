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

  /** raw → canonical match key (normalize + fillers + alt expansion). */
  def matchKey(raw: String): String = {
    if (raw == null) return null
    val canon = Normalize.canonical(raw)
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
