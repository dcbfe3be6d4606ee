package graft.text

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HtmlTextExtractor

class HtmlTextSpec extends AnyFunSuite {

  private def x(html: String, minChars: Int = 20, maxLinkPct: Int = 33): String =
    HtmlTextExtractor.extract(UTF8String.fromString(html), minChars, maxLinkPct)
      .toString

  test("keeps the prose paragraph, drops head/nav/footer chrome") {
    val html =
      "<html><head><title>T</title><style>p{}</style><script>var a='<p>';" +
        "</script></head><body><nav><a href=\"/\">home</a> <a href=\"/x\">x</a>" +
        "</nav><h1>Short</h1><p>this paragraph is long enough to keep for sure" +
        "</p><footer><a href=\"/p\">prev</a> &copy; 2026</footer></body></html>"
    assert(x(html) == "this paragraph is long enough to keep for sure")
  }

  test("decodes entities: named, decimal, hex; unknown stays literal") {
    val html = "<p>a &amp; b &lt;c&gt; &quot;q&quot; &#65;&#x42; &bogus; end of block</p>"
    assert(x(html, minChars = 5) == "a & b <c> \"q\" AB &bogus; end of block")
  }

  test("collapses whitespace runs and trims blocks") {
    assert(x("<p>  one\t\ttwo\r\n  three  and some more words  </p>", minChars = 5)
      == "one two three and some more words")
  }

  test("link density drops navigation but keeps prose with an inline link") {
    // one link in long prose: density well under the bar
    val prose = "<p>some prose with <a href=\"/x\">a link</a> inside a longer " +
      "sentence that clearly dominates the characters</p>"
    assert(x(prose).startsWith("some prose with a link inside"))
    // all-link block: dropped even when long
    val nav = "<div><a href=\"/a\">aaaaaaaaaaaaaaa</a> <a href=\"/b\">" +
      "bbbbbbbbbbbbbbb</a></div>"
    assert(x(nav) == "")
  }

  test("comments, doctype, and attribute quotes hiding '>' are handled") {
    val html = "<!DOCTYPE html><!-- c <p>not text</p> --><p title=\"a>b\">" +
      "real text that is long enough to keep</p>"
    assert(x(html) == "real text that is long enough to keep")
  }

  test("bare '<' that opens no tag is literal text") {
    assert(x("<p>x < y and y > z in a long enough block</p>", minChars = 5)
      == "x < y and y > z in a long enough block")
  }

  test("block tags split blocks: two short halves both fail minChars") {
    // one 30-char run would pass; split by <br> into two 15-char runs it must not
    val html = "<p>fifteen chars a<br>fifteen chars b</p>"
    assert(x(html, minChars = 20) == "")
    assert(x(html, minChars = 10) == "fifteen chars a\nfifteen chars b")
  }

  test("unterminated script swallows the rest; unterminated tag ends input") {
    assert(x("<p>kept text long enough here</p><script>var a=1;", minChars = 5)
      == "kept text long enough here")
    assert(x("<p>kept text long enough here</p><p unfinished", minChars = 5)
      == "kept text long enough here")
  }

  test("empty and null-free edge cases") {
    assert(x("") == "")
    assert(x("plain text with no markup at all, long enough", minChars = 5)
      == "plain text with no markup at all, long enough")
  }

  test("end-tag boundary: </header> does not close a <head> skip") {
    // regression (ADVICE r11): the skip-subtree scan for "</head" must
    // require a tag-name boundary char after the name — "</header>" is a
    // DIFFERENT tag and must not terminate the <head> skip, or the rest
    // of the head subtree (here: a <style> body) leaks into the text
    val html = "<head><header>chrome text inside the head subtree</header>" +
      "<style>p { color: red } stylesheet noise long enough</style></head>" +
      "<p>real body prose that is long enough to keep</p>"
    assert(x(html, minChars = 5) == "real body prose that is long enough to keep")
  }

  test("end-tag boundary: </scripted> does not close a <script> skip") {
    val html = "<script>var s = '</scripted>'; leaked script body text here;" +
      "</script><p>the only real prose block long enough to keep</p>"
    assert(x(html, minChars = 5) == "the only real prose block long enough to keep")
    // whitespace and '/' after the name ARE valid boundaries
    assert(x("<script>x</script ><p>kept prose long enough here</p>", minChars = 5)
      == "kept prose long enough here")
  }

  test("expression is codegen-compatible end to end") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = Seq("<p>a long enough paragraph of text to keep</p>")
      .toDF("html")
      .select(call_function("graft_html_text", col("html"), lit(20), lit(33))
        .as("t"))
      .head().getString(0)
    assert(out == "a long enough paragraph of text to keep")
  }
}
