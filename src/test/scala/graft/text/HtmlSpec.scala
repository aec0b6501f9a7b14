package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.SparkTestSession
import graft.{functions => gf}

/** The html:binary ingestion kernel: visible-text extraction semantics on
  * hand fixtures, the per-url invariant against the synthetic corpus
  * (extract(html) == the text column every other operator consumes), and
  * the codegen expression over both binary and string inputs.
  */
class HtmlSpec extends AnyFunSuite {
  private def x(s: String) = Html.extractText(s)

  test("tags are stripped; block boundaries separate, inline tags do not") {
    assert(x("<p>hello</p><p>world</p>") == "hello world")
    assert(x("ab<b>cd</b>ef") == "abcdef")
    assert(x("ab<p>cd") == "ab cd")
    assert(x("<div><span>a</span><div>b</div></div>") == "a b")
  }

  test("script and style content is skipped, case-insensitive close") {
    assert(x("""a<script>if (1 < 2 && q) { s = "</div>"; }</script>b""") == "a b")
    assert(x("a<SCRIPT>var x;</ScRiPt>b") == "a b")
    assert(x("a<style>p { color: #fff; }</style>b") == "a b")
    assert(x("a<script>never closed") == "a")
    // a CLOSING </script> with no opener must not trigger a skip
    assert(x("a</script>b") == "a b")
    // self-closed script has no body to skip
    assert(x("a<script src=\"x.js\"/>b") == "a b")
  }

  test("comments are skipped whole") {
    assert(x("a<!-- <p>not text</p> -->b") == "a b")
    assert(x("a<!-- never closed") == "a")
  }

  test("character references decode; unknown or bare stay literal") {
    assert(x("fish &amp; chips") == "fish & chips")
    assert(x("1 &lt; 2 &gt; 0 &quot;q&quot; &apos;a&apos;") == "1 < 2 > 0 \"q\" 'a'")
    assert(x("a&nbsp;b") == "a b")
    assert(x("Doc&#35;7 &#x41;") == "Doc#7 A")
    assert(x("AT&T &unknown; 5 & 6 &#xZZ;") == "AT&T &unknown; 5 & 6 &#xZZ;")
  }

  test("bare '<' in prose is text; whitespace runs collapse; NBSP collapses") {
    assert(x("1 < 2") == "1 < 2")
    assert(x("  a \t\n b  c  ") == "a b c")
    assert(x("") == "")
    assert(x("<html><body></body></html>") == "")
  }

  test("corpus invariant: extract(html bytes) == the text column, per url") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val pages = graft.er.Corpus.pages(spark, 200L, 50, 42L).toDF()
    val collapsedText = trim(regexp_replace(col("text"), "\\s+", " "))
    val bad = pages
      .select(col("url"), gf.html_text(col("html")).as("ex"), collapsedText.as("want"))
      .filter(col("ex") =!= col("want"))
    assert(bad.count() == 0, bad.take(3).mkString("; "))
  }

  test("expression accepts string input too and survives codegen") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val out = Seq("<p>a&amp;b</p>").toDF("h")
      .select(gf.html_text(col("h")).as("t")).as[String].head()
    assert(out == "a&b")
  }
}
