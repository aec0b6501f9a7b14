package graft.text

import java.nio.charset.StandardCharsets

/** HTML → visible-text extraction for `html: binary` page payloads (the
  * input_hint's Common-Crawl-style column the rest of the pipeline reads
  * pre-extracted as `text`). One deterministic O(n) pass, no DOM:
  *
  *  - tags are stripped; `<script>`/`<style>` element CONTENT is skipped
  *    to the matching close tag (case-insensitive), `<!-- -->` comments
  *    are skipped whole;
  *  - a `<` is a tag only when followed by a letter, `/`, `!` or `?`
  *    (processing instruction) — bare `<` in prose (`1 < 2`) is text,
  *    matching the HTML5 tokenizer's less-than-sign-in-data rule;
  *  - character references decode: the named set that dominates web text
  *    (`amp lt gt quot apos nbsp`) plus numeric `&#NNN;` / `&#xHH;`;
  *    an unterminated or unknown `&...` is literal text;
  *  - block-level tag boundaries separate words; the common inline tags
  *    (`a b i em strong span u s small sup sub code mark abbr time wbr`)
  *    do not (`ab<b>cd</b>` → `abcd`, `ab<p>cd` → `ab cd`);
  *  - all whitespace runs (including NBSP, decoded or literal) collapse
  *    to one space, leading/trailing trimmed — the canonical form the
  *    dedup/quality/langid operators expect.
  *
  * Per-row, allocation-light, and wrapped by the codegen expression
  * [[graft.functions.HtmlText]] — the extraction itself stays inside
  * whole-stage codegen like every other text kernel here.
  */
object Html {

  private val HrefPattern = java.util.regex.Pattern.compile(
    """(?i)(?:^|\s)href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""")

  /** Outlink extraction: the `href` of every `<a>` tag, in document
    * order. Links inside comments and script/style bodies are NOT links
    * (same skip rules as [[extractText]]); double-quoted, single-quoted
    * and unquoted attribute forms all parse; an `<a>` without an href
    * contributes nothing. The (document-order) outlink list is the raw
    * edge material of the crawl link graph — see
    * [[graft.ops.LinkGraph]]. */
  def extractLinksBytes(html: Array[Byte]): Array[String] =
    extractLinks(new String(html, StandardCharsets.UTF_8))

  def extractLinks(html: String): Array[String] = {
    val n = html.length
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.regionMatches(i, "<!--", 0, 4)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n && {
          val d = html.charAt(i + 1)
          Character.isLetter(d) || d == '/' || d == '!' || d == '?'
        }) {
          var j = i + 1
          val closing = html.charAt(j) == '/'
          if (closing || html.charAt(j) == '!' || html.charAt(j) == '?') j += 1
          val ts = j
          while (j < n && Character.isLetterOrDigit(html.charAt(j))) j += 1
          val name = html.substring(ts, j).toLowerCase
          val gt = html.indexOf('>', j)
          if (gt < 0) i = n
          else {
            val selfClosed = gt > i && html.charAt(gt - 1) == '/'
            if (!closing && name == "a") {
              val m = HrefPattern.matcher(html.substring(j, gt))
              if (m.find()) {
                val v =
                  if (m.group(1) != null) m.group(1)
                  else if (m.group(2) != null) m.group(2)
                  else m.group(3)
                out += v
              }
            }
            i = gt + 1
            if (!closing && !selfClosed && (name == "script" || name == "style")) {
              var e = i
              var found = -1
              val needle = "</" + name
              while (found < 0 && e <= n - needle.length) {
                if (html.regionMatches(true, e, needle, 0, needle.length)) found = e
                e += 1
              }
              if (found < 0) i = n
              else {
                val g2 = html.indexOf('>', found)
                i = if (g2 < 0) n else g2 + 1
              }
            }
          }
        } else i += 1
      } else i += 1
    }
    out.toArray
  }

  private val Inline: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("a", "b", "i", "em", "strong", "span", "u", "s", "small", "sup",
      "sub", "code", "mark", "abbr", "time", "wbr").foreach(s.add)
    s
  }

  def extractTextBytes(html: Array[Byte]): String =
    extractText(new String(html, StandardCharsets.UTF_8))

  def extractText(html: String): String = {
    val n = html.length
    val sb = new java.lang.StringBuilder(math.min(n, 1 << 12))
    var pendingSpace = false
    var i = 0

    def emitChar(c: Char): Unit = {
      if (pendingSpace && sb.length > 0) sb.append(' ')
      pendingSpace = false
      sb.append(c)
    }
    def emitCodePoint(cp: Int): Unit = {
      if (cp == 0xA0 || (cp <= 0xFFFF && Character.isWhitespace(cp.toChar)) ||
        Character.isSpaceChar(cp)) pendingSpace = true
      else {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.appendCodePoint(cp)
      }
    }
    def indexOfIgnoreCase(needle: String, from: Int): Int = {
      var k = from
      val last = n - needle.length
      while (k <= last) {
        if (html.regionMatches(true, k, needle, 0, needle.length)) return k
        k += 1
      }
      -1
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.regionMatches(i, "<!--", 0, 4)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
          pendingSpace = true
        } else if (i + 1 < n && {
          val d = html.charAt(i + 1)
          Character.isLetter(d) || d == '/' || d == '!' || d == '?'
        }) {
          var j = i + 1
          val closing = html.charAt(j) == '/'
          if (closing || html.charAt(j) == '!' || html.charAt(j) == '?') j += 1
          val ts = j
          while (j < n && Character.isLetterOrDigit(html.charAt(j))) j += 1
          val name = html.substring(ts, j).toLowerCase
          val gt = html.indexOf('>', j)
          if (gt < 0) i = n // unclosed tag at EOF: nothing visible follows
          else {
            val selfClosed = gt > i && html.charAt(gt - 1) == '/'
            i = gt + 1
            if (!closing && !selfClosed && (name == "script" || name == "style")) {
              val e = indexOfIgnoreCase("</" + name, i)
              if (e < 0) i = n
              else {
                val g2 = html.indexOf('>', e)
                i = if (g2 < 0) n else g2 + 1
              }
            }
            if (!Inline.contains(name)) pendingSpace = true
          }
        } else { emitChar('<'); i += 1 } // bare '<' in prose is text
      } else if (c == '&') {
        val semi = html.indexOf(';', i + 1)
        val decoded: Int =
          if (semi < 0 || semi - i > 10) -1
          else {
            val body = html.substring(i + 1, semi)
            body match {
              case "amp" => '&'.toInt
              case "lt" => '<'.toInt
              case "gt" => '>'.toInt
              case "quot" => '"'.toInt
              case "apos" => '\''.toInt
              case "nbsp" => 0xA0
              case _ =>
                if (body.length > 1 && body.charAt(0) == '#') {
                  try {
                    val v =
                      if (body.charAt(1) == 'x' || body.charAt(1) == 'X')
                        Integer.parseInt(body.substring(2), 16)
                      else Integer.parseInt(body.substring(1))
                    if (Character.isValidCodePoint(v)) v else -1
                  } catch { case _: NumberFormatException => -1 }
                } else -1
            }
          }
        if (decoded >= 0) { emitCodePoint(decoded); i = semi + 1 }
        else { emitChar('&'); i += 1 }
      } else if (c == ' ' || c == '\u00A0' || Character.isWhitespace(c)) {
        pendingSpace = true
        i += 1
      } else {
        emitChar(c)
        i += 1
      }
    }
    sb.toString
  }
}
