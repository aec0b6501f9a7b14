package graft.text

/** Per-country address formatting — the reference's X14 operator
  * (/root/reference/src/formatter.cc:87-159). The reference renders a
  * mustache template per country code (from the public OpenCageData
  * address-formatting `worldwide.yaml` it bundles as a resource), after
  * rewriting `", "` → `"\n"`, then cleans empty lines and rejoins with
  * `", "`. Goldens: /root/reference/test/formatter_test.cc:5-31.
  *
  * This port implements the mustache subset the templates use
  * (`{{{var}}}` substitution and the `{{#first}} a || b {{/first}}`
  * first-non-empty lambda, formatter.cc:111-126) plus the exact cleanup
  * pipeline (empty-line removal, `" ."` erasure, trim; formatter.cc:
  * 128-157). Unknown countries fall back to "house_number road"
  * (formatter.cc:88-93).
  */
object Formatter {

  final case class Address(
      houseNumber: String = "",
      road: String = "",
      neighbourhood: String = "",
      suburb: String = "",
      postcode: String = "",
      city: String = "",
      county: String = "",
      state: String = "",
      country: String = "",
      countryCode: String = "")

  /** Address templates for the country codes this engine ships; the same
    * shapes as the OpenCageData worldwide.yaml entries the reference
    * bundles (house-number position and component order per country). */
  private val templates: Map[String, String] = Map(
    "FR" -> """{{{attention}}}
              |{{{house}}}
              |{{{house_number}}} {{{road}}}
              |{{{postcode}}} {{{city}}}
              |{{{country}}}""".stripMargin,
    "US" -> """{{{attention}}}
              |{{{house}}}
              |{{{house_number}}} {{{road}}}
              |{{{city}}}, {{{state}}} {{{postcode}}}
              |{{{country}}}""".stripMargin,
    "GB" -> """{{{attention}}}
              |{{{house}}}
              |{{{house_number}}} {{{road}}}
              |{{{city}}}
              |{{{postcode}}}
              |{{{country}}}""".stripMargin,
    "DE" -> """{{{attention}}}
              |{{{house}}}
              |{{{road}}} {{{house_number}}}
              |{{{postcode}}} {{{city}}}
              |{{{country}}}""".stripMargin,
    "HU" -> """{{{attention}}}
              |{{{house}}}
              |{{{city}}}
              |{{{road}}} {{{house_number}}}
              |{{{postcode}}}
              |{{{country}}}""".stripMargin
  )

  private val varPattern = java.util.regex.Pattern.compile("\\{\\{\\{(\\w+)\\}\\}\\}")
  private val firstPattern =
    java.util.regex.Pattern.compile("(?s)\\{\\{#first\\}\\}(.*?)\\{\\{/first\\}\\}")

  private def bindings(a: Address): Map[String, String] = Map(
    "house_number" -> a.houseNumber, "road" -> a.road,
    "neighbourhood" -> a.neighbourhood, "suburb" -> a.suburb,
    "postcode" -> a.postcode, "city" -> a.city, "county" -> a.county,
    "state" -> a.state, "country" -> a.country,
    "country_code" -> a.countryCode)

  private def substitute(template: String, b: Map[String, String]): String = {
    val m = varPattern.matcher(template)
    val sb = new java.lang.StringBuilder
    while (m.find()) m.appendReplacement(sb,
      java.util.regex.Matcher.quoteReplacement(b.getOrElse(m.group(1), "")))
    m.appendTail(sb)
    sb.toString
  }

  /** The `first` lambda (formatter.cc:111-126): render the block, split on
    * "||", return the first non-empty trimmed alternative. */
  private def renderFirstBlocks(template: String, b: Map[String, String]): String = {
    val m = firstPattern.matcher(template)
    val sb = new java.lang.StringBuilder
    while (m.find()) {
      val rendered = substitute(m.group(1), b)
      val first = rendered.split("\\|\\|").iterator.map(_.trim).find(_.nonEmpty).getOrElse("")
      m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(first))
    }
    m.appendTail(sb)
    sb.toString
  }

  /** formatter.cc:128-146 — drop empty lines (any line whose removal was
    * triggered by a preceding newline or start/end), i.e. collapse newline
    * runs and leading newlines. */
  private def cleanLines(s: String): String = {
    val out = new StringBuilder
    var removeNext = true
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\n') {
        if (!removeNext) out.append(c)
        removeNext = true
      } else {
        removeNext = false
        out.append(c)
      }
      i += 1
    }
    out.toString
  }

  def format(a: Address): String = templates.get(a.countryCode) match {
    case None =>
      if (a.houseNumber.isEmpty) a.road else a.houseNumber + " " + a.road
    case Some(t0) =>
      val b = bindings(a)
      val t = t0.replace(", ", "\n") // formatter.cc:128
      var s = substitute(renderFirstBlocks(t, b), b)
      s = cleanLines(s)
      s = s.replaceAll("[\\n\\t\\r ]+$", "").replaceAll("^[\\n\\t\\r ]+", "")
      s = s.replace(" .", "")
      s = s.replace("\n", ", ")
      // per-line residue: a line rendered as "number <empty road>" keeps a
      // trailing space; the reference's utl trim only strips the ends, and
      // inner lines were cleaned above — trim segment edges after the join
      s.split(", ", -1).iterator.map(_.trim).filter(_.nonEmpty).mkString(", ")
  }
}
