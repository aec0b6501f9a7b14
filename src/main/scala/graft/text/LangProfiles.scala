package graft.text

/** Char-trigram language profiles (Cavnar–Trenkle-style, deterministic) —
  * THE single definition shared by the declarative q28 oracle generator
  * (graft.ops.TextOps) and the fused codegen counting kernel
  * (graft.functions.ExprKernels.profileHits). The most frequent
  * DISTINCTIVE space-free trigrams of each language, derived from its
  * function words, written in POST-NORMALIZE space (casefolded,
  * diacritics stripped: ção→cao, för→for, ї→і). Shared n-grams ("ent",
  * "ion") are deliberately excluded so profiles discriminate instead of
  * overlap; the few remaining cross-language grams ("que" fr/pt, "den"
  * de/sv) are handled by multi-membership in the kernel's bitmask.
  * Profiles only disambiguate WITHIN a script — the script gate
  * (script_counts) routes first. ORDER IS CONTRACT: the hit-count array
  * slots and the q28 oracle SQL columns are both generated from this
  * sequence order.
  */
object LangProfiles {
  val latin: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "ing", "hat", "tha", "thi", "his", "ith",
      "wit", "you", "all", "are", "was", "hav", "not", "for", "oul", "uld",
      "ght", "ere"),
    "de" -> Seq("der", "die", "das", "und", "ein", "ich", "sch", "cht",
      "den", "ung", "gen", "ber", "hen", "nde", "ist", "auf", "mit", "ach",
      "eit", "zur"),
    "fr" -> Seq("les", "des", "que", "est", "une", "ait", "our", "ous",
      "ans", "dan", "ett", "eur", "ave", "vec", "pas", "sur", "ais", "qui",
      "dec", "ses"),
    "es" -> Seq("los", "las", "del", "con", "por", "una", "par", "ara",
      "ado", "cio", "ion", "nto", "com", "sta", "ien", "aba", "ndo", "ega",
      "nos", "tra"),
    "it" -> Seq("che", "gli", "zio", "lla", "tto", "nno", "ono", "ita",
      "tal", "lia", "ano", "ore", "olt", "lto", "ssi", "osa", "piu", "tut",
      "ell"),
    "pt" -> Seq("cao", "oes", "nao", "voc", "oce", "lho", "nha", "eir",
      "ira", "mos", "amo", "dos", "das", "ele", "seu", "sua", "sso", "bem",
      "tem", "uem", "ond", "inh", "que"),
    "nl" -> Seq("het", "een", "nie", "iet", "aar", "ijn", "zij", "maa",
      "daa", "oor", "gee", "elk", "waa", "jke", "erl", "rla", "ken", "nen",
      "ede", "van", "aan", "ond", "gaa", "uis", "ijk"),
    "sv" -> Seq("och", "att", "det", "som", "ett", "int", "nte", "til",
      "ite", "kan", "ska", "ans", "fra", "lig", "iga", "nge", "ver", "sve",
      "ade", "den", "gen", "all"),
    "pl" -> Seq("prz", "rze", "ego", "ych", "owa", "ani", "eni", "czy",
      "szy", "sze", "dzi", "iej", "ski", "pol", "ach", "owy"),
    "tr" -> Seq("bir", "lar", "ler", "dir", "mek", "mak", "yor", "iyo",
      "ile", "kad", "nda", "ini", "tur", "urk", "rki", "iye", "sin", "lik"),
    "ro" -> Seq("ulu", "lui", "cea", "ele", "rom", "oma", "ati", "tii",
      "ntr", "tru", "pen", "dea", "ste", "ria", "uri", "ara", "eni", "cat"),
    "id" -> Seq("ang", "yan", "men", "kan", "ada", "itu", "ter", "nya",
      "aka", "dan", "dal", "ind", "nes", "ora", "ran", "gan"))

  val cyrillic: Seq[(String, Seq[String])] = Seq(
    "bg" -> Seq("ата", "ите", "ото", "пре", "ста", "ния", "ени", "ато",
      "ова", "ква", "про", "ост", "ват", "ане", "кат", "ето", "ива", "тел",
      "раз", "нат"),
    "ru" -> Seq("что", "это", "ого", "его", "ств", "ать", "ить", "тся",
      "етс", "льн", "ски", "рус", "осс", "жет", "кто", "тот", "дет", "ает",
      "дом"),
    "uk" -> Seq("ння", "ної", "ськ", "цьк", "іст", "іна", "раі", "укр",
      "ідн", "від", "іль", "ься", "ому", "іти", "ідо", "шли", "ніж"),
    "sr" -> Seq("ије", "јед", "ање", "ење", "има", "срб", "рби", "ући",
      "ашњ", "дин", "вањ", "ошт"))

  /** Flattened (lang, profile) list — slot i of the profileHits count
    * array is all(i)._1's hit count. */
  val all: Seq[(String, Seq[String])] = latin ++ cyrillic
}
