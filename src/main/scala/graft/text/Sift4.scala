package graft.text

import java.nio.charset.StandardCharsets

/** SIFT4 "common" greedy edit distance with transpositions — exact port of
  * the reference's scorer (/root/reference/include/adr/sift4.h:17-119),
  * which is the pair-scoring distance actually used by the matcher
  * (score.h:75-79: maxOffset=3, maxDistance=min(len)/2+2).
  *
  * Operates on UTF-8 *bytes* like the reference (string_view chars).
  * Inputs longer than 254 bytes are truncated (the reference asserts
  * len < 255 because its cursors are u8).
  */
object Sift4 {
  final val MaxLen = 254

  def dist(s1: String, s2: String, maxOffset: Int, maxDistance: Int): Int =
    distBytes(utf8(s1), utf8(s2), maxOffset, maxDistance)

  private def utf8(s: String): Array[Byte] = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    if (b.length > MaxLen) java.util.Arrays.copyOf(b, MaxLen) else b
  }

  def distBytes(s1: Array[Byte], s2: Array[Byte], maxOffset: Int, maxDistance: Int): Int = {
    val a = new Array[Int](s1.length)
    var i = 0
    while (i < s1.length) { a(i) = s1(i).toInt; i += 1 }
    val b = new Array[Int](s2.length)
    i = 0
    while (i < s2.length) { b(i) = s2(i).toInt; i += 1 }
    distGeneric(a, b, maxOffset, maxDistance)
  }

  /** Codepoint-level SIFT4: one *user* edit (typo) is one edit regardless
    * of script — byte-level distance double-counts edits on multi-byte
    * UTF-8 (a Cyrillic transposition is 4 byte edits but 1 typo). Used by
    * the ER accept gate; the byte variant above keeps reference parity. */
  def distCodepoints(s1: String, s2: String, maxOffset: Int, maxDistance: Int): Int = {
    val a = s1.codePoints().limit(MaxLen).toArray
    val b = s2.codePoints().limit(MaxLen).toArray
    distGeneric(a, b, maxOffset, maxDistance)
  }

  def distGeneric(s1: Array[Int], s2: Array[Int], maxOffset: Int, maxDistance: Int): Int = {
    if (s1.length == 0) return s2.length
    if (s2.length == 0) return s1.length

    val l1 = s1.length
    val l2 = s2.length

    // parallel arrays for the offset list (sift4.h offset_arr)
    var cap = 16
    var oc1 = new Array[Int](cap)
    var oc2 = new Array[Int](cap)
    var otr = new Array[Boolean](cap)
    var on = 0

    var c1 = 0
    var c2 = 0
    var lcss = 0
    var localCs = 0
    var trans = 0

    while (c1 < l1 && c2 < l2) {
      if (s1(c1) == s2(c2)) {
        localCs += 1
        var isTrans = false
        var i = 0
        var break = false
        while (i < on && !break) {
          if (c1 <= oc1(i) || c2 <= oc2(i)) {
            isTrans = math.abs(c2 - c1) >= math.abs(oc2(i) - oc1(i))
            if (isTrans) trans += 1
            else if (!otr(i)) { otr(i) = true; trans += 1 }
            break = true
          } else {
            if (c1 > oc2(i) && c2 > oc1(i)) {
              // erase element i (shift left)
              var j = i
              while (j < on - 1) { oc1(j) = oc1(j + 1); oc2(j) = oc2(j + 1); otr(j) = otr(j + 1); j += 1 }
              on -= 1
            } else i += 1
          }
        }
        if (on == cap) {
          cap *= 2
          oc1 = java.util.Arrays.copyOf(oc1, cap)
          oc2 = java.util.Arrays.copyOf(oc2, cap)
          otr = java.util.Arrays.copyOf(otr, cap)
        }
        oc1(on) = c1; oc2(on) = c2; otr(on) = isTrans; on += 1
      } else {
        lcss += localCs
        localCs = 0
        if (c1 != c2) { val m = math.min(c1, c2); c1 = m; c2 = m }
        if (maxDistance != 0) {
          val temporaryDistance = math.max(c1, c2) - lcss + trans
          if (temporaryDistance > maxDistance) return temporaryDistance
        }
        var i = 0
        var break = false
        while (i < maxOffset && (c1 + i < l1 || c2 + i < l2) && !break) {
          if (c1 + i < l1 && s1(c1 + i) == s2(c2)) {
            c1 += i - 1; c2 -= 1; break = true
          } else if (c2 + i < l2 && s1(c1) == s2(c2 + i)) {
            c1 -= 1; c2 += i - 1; break = true
          } else i += 1
        }
      }
      c1 += 1
      c2 += 1
      if (c1 >= l1 || c2 >= l2) {
        lcss += localCs
        localCs = 0
        val m = math.min(c1, c2); c1 = m; c2 = m
      }
    }
    lcss += localCs
    math.max(l1, l2) - lcss + trans
  }
}
