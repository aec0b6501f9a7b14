package graft.text

import com.ibm.icu.lang.UCharacter
import com.ibm.icu.text.Normalizer2

/** Text normalization with the exact semantics of the reference's
  * utf8proc-based `normalize` (/root/reference/include/adr/normalize.h:48-71):
  * NFD decomposition + mark stripping + full Unicode case folding
  * (UTF8PROC_DECOMPOSE | UTF8PROC_STRIPMARK | UTF8PROC_CASEFOLD).
  *
  * Implemented via ICU4J (`icu4j-77.1.jar`, on the unmanaged classpath):
  * full case fold first (ß→ss, İ→i+dot), then NFD, then remove combining
  * marks (general categories Mn/Mc/Me). The result stays decomposed (NFD),
  * matching utf8proc's DECOMPOSE output. Goldens:
  * /root/reference/test/simple_test.cc:20-47 ("Landwehrstraße").
  *
  * Pure, locale-independent, no wall clock — deterministic by construction
  * so that extracted text is byte-identical across partitionings and runs.
  */
object Normalize {
  private val nfd: Normalizer2 = Normalizer2.getNFDInstance

  /** utf8proc DECOMPOSE|STRIPMARK|CASEFOLD equivalent. */
  def normalize(in: String): String = {
    if (in == null) return null
    if (in.isEmpty) return in
    // Fast path: pure printable ASCII needs only lowercasing.
    var ascii = true
    var i = 0
    while (ascii && i < in.length) { if (in.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) {
      val sb = new java.lang.StringBuilder(in.length)
      i = 0
      while (i < in.length) {
        val c = in.charAt(i)
        sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
        i += 1
      }
      return sb.toString
    }
    val folded = UCharacter.foldCase(in, UCharacter.FOLD_CASE_DEFAULT)
    val decomposed = nfd.normalize(folded)
    val sb = new java.lang.StringBuilder(decomposed.length)
    var j = 0
    while (j < decomposed.length) {
      val cp = decomposed.codePointAt(j)
      val cat = UCharacter.getType(cp)
      val isMark = cat == Character.NON_SPACING_MARK.toInt ||
        cat == Character.COMBINING_SPACING_MARK.toInt ||
        cat == Character.ENCLOSING_MARK.toInt
      if (!isMark) sb.appendCodePoint(cp)
      j += Character.charCount(cp)
    }
    sb.toString
  }

  /** Exact port of `erase_fillers` (normalize.h:28-46): map `,;-/().` to
    * space, collapse *adjacent duplicate* spaces, strip trailing then
    * leading spaces.
    */
  def eraseFillers(in: String): String = {
    if (in == null) return null
    val n = in.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var prev: Char = 0
    while (i < n) {
      val c0 = in.charAt(i)
      val c = c0 match {
        case ',' | ';' | '-' | '/' | '(' | ')' | '.' => ' '
        case other => other
      }
      if (!(c == ' ' && prev == ' ')) sb.append(c)
      prev = c
      i += 1
    }
    // trim trailing then leading spaces
    var end = sb.length
    while (end > 0 && sb.charAt(end - 1) == ' ') end -= 1
    var start = 0
    while (start < end && sb.charAt(start) == ' ') start += 1
    sb.substring(start, end)
  }

  /** normalize + eraseFillers — the canonical form used for tokenizing and
    * blocking keys. */
  def canonical(in: String): String =
    if (in == null) null else eraseFillers(normalize(in))

  /** Query-side tokenizer mirroring get_suggestions.cc:626-641: split the
    * *raw* input on ' ', normalize each token, erase fillers per token
    * (a token like "Groß-Umstadt" thus becomes one token containing an
    * inner space: "gross umstadt" — reference quirk, kept), drop empties,
    * cap at kMaxTokens=8.
    */
  val MaxTokens = 8

  def tokenizeQuery(in: String): Vector[String] = {
    if (in == null) return Vector.empty
    val out = Vector.newBuilder[String]
    var count = 0
    var i = 0
    val n = in.length
    while (i < n && count < MaxTokens) {
      while (i < n && in.charAt(i) == ' ') i += 1
      val start = i
      while (i < n && in.charAt(i) != ' ') i += 1
      if (i > start) {
        val tok = eraseFillers(normalize(in.substring(start, i)))
        if (tok.nonEmpty) { out += tok; count += 1 }
      }
    }
    out.result()
  }

  /** Dataset-side tokenizer mirroring get_match_score's for_each_token
    * (score.h:147-188): split the *normalized* string on any of
    * ` -,;/().`, skip empty tokens, cap 8.
    */
  def tokenizeDataset(normalized: String): Vector[String] = {
    if (normalized == null) return Vector.empty
    val out = Vector.newBuilder[String]
    var count = 0
    var i = 0
    val n = normalized.length
    def isDelim(c: Char): Boolean = c match {
      case ' ' | '-' | ',' | ';' | '/' | '(' | ')' | '.' => true
      case _ => false
    }
    while (i < n && count < MaxTokens) {
      while (i < n && isDelim(normalized.charAt(i))) i += 1
      val start = i
      while (i < n && !isDelim(normalized.charAt(i))) i += 1
      if (i > start) { out += normalized.substring(start, i); count += 1 }
    }
    out.result()
  }

  /** Port of get_numeric_tokens_mask (normalize.h:192-206): bit i set if
    * token i has ≥1 digit and digit count ≥ ceil(len/2). */
  def numericTokensMask(tokens: Seq[String]): Int = {
    var mask = 0
    var i = 0
    tokens.foreach { t =>
      var digits = 0
      var j = 0
      while (j < t.length) { if (t.charAt(j) >= '0' && t.charAt(j) <= '9') digits += 1; j += 1 }
      if (digits != 0 && digits >= (t.length + 1) / 2) mask |= 1 << i
      i += 1
    }
    mask
  }
}
