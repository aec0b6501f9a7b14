package graft.text

import java.nio.charset.StandardCharsets

/** The reference's pair scorer — exact port of get_token_match_score and
  * get_match_score (/root/reference/include/adr/score.h:59-135, 162-269).
  * All arithmetic in Float to match C++ `score_t = float` bit-for-bit;
  * string ops on UTF-8 bytes like the reference's string_view walks.
  *
  * NoMatch sentinel = Float.MaxValue (types.h:148-149).
  */
object MatchScore {
  final val NoMatch: Float = Float.MaxValue

  /** score.h:59-135. `datasetToken` and `p` must already be normalized.
    * Asymmetric: the dataset token is prefix-cut to the query length. */
  def tokenMatchScore(datasetToken: String, p: String): Float = {
    if (datasetToken == p) return -2.0f - p.getBytes(StandardCharsets.UTF_8).length * 0.75f
    val d = datasetToken.getBytes(StandardCharsets.UTF_8)
    val q = p.getBytes(StandardCharsets.UTF_8)
    tokenMatchScoreBytes(d, q)
  }

  def tokenMatchScoreBytes(d: Array[Byte], q: Array[Byte]): Float = {
    if (java.util.Arrays.equals(d, q)) return -2.0f - q.length * 0.75f
    val cutLen = math.min(d.length, q.length)
    val cut = if (d.length == cutLen) d else java.util.Arrays.copyOf(d, cutLen)
    val maxDistance = math.min(d.length, q.length) / 2 + 2
    val dist = Sift4.distBytes(cut, q, 3, maxDistance)
    if (dist >= cut.length) return NoMatch
    val overhangPenalty =
      math.min(4.0f, (d.length - math.min(d.length, q.length)).toFloat / 4.0f)
    val relativeCoverage = 6.0f * (dist.toFloat / cut.length.toFloat)
    var commonPrefixBonus = 0.0f
    val end = math.min(cut.length, q.length)
    var i = 0
    var break = false
    while (i < end && !break) {
      if (cut(i) != q(i)) break = true
      else { commonPrefixBonus -= 0.25f; i += 1 }
    }
    val firstLetterMismatchPenalty = if (cut(0) != q(0)) 2.0f else -0.5f
    val secondLetterMismatchPenalty =
      if (cut.length > 1 && q.length > 1) { if (cut(1) != q(1)) 1.0f else -0.25f }
      else -0.25f
    val score = dist + firstLetterMismatchPenalty + secondLetterMismatchPenalty +
      overhangPenalty + relativeCoverage + commonPrefixBonus
    if (score > math.ceil(cut.length.toFloat / 2.0f).toFloat) NoMatch else score
  }

  /** score.h:162-269. `s` is the raw dataset name (normalized inside);
    * `pToken` is an already-normalized input phrase. */
  def matchScore(s: String, pToken: String): Float = {
    if (s == null || pToken == null || s.isEmpty || pToken.isEmpty) return NoMatch
    val normalized = Normalize.normalize(s)
    val sTokens = Normalize.tokenizeDataset(normalized)
    val fallback = tokenMatchScore(normalized, pToken)
    if (sTokens.size == 1) return fallback

    var bestScore = NoMatch
    var bestBits = 0
    Phrases.forEachPhrase(sTokens) { (bits, sPhrase) =>
      val sc = tokenMatchScore(sPhrase, pToken)
      if (bestScore > sc) { bestBits = bits; bestScore = sc }
    }
    if (bestScore == NoMatch) return NoMatch

    var sum = bestScore
    var nNotMatched = 0
    var idx = 0
    while (idx < sTokens.size) {
      if ((bestBits & (1 << idx)) == 0) {
        nNotMatched += 1
        val len = sTokens(idx).getBytes(StandardCharsets.UTF_8).length
        val penalty = math.max(0.75f, math.min(3.0f, len.toFloat / 4.0f))
        sum += penalty
      }
      idx += 1
    }
    if (nNotMatched == sTokens.size) return NoMatch

    val sLen = s.getBytes(StandardCharsets.UTF_8).length
    val pLen = pToken.getBytes(StandardCharsets.UTF_8).length
    val max = math.ceil(math.min(sLen, pLen).toFloat / 2.0f).toFloat
    val score = math.min(fallback, sum)
    if (score >= max) NoMatch else score
  }
}
