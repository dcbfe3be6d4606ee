package graft.text

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HtmlTextExtractor

/** Generative properties for the HTML extraction kernel: the fixed
  * cases in HtmlTextSpec pin known edges; these fuzz tag soup — an
  * ingestion front door sees arbitrarily malformed markup and must
  * never throw, always terminate, and stay deterministic.
  */
class HtmlPropertySpec extends AnyFunSuite {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val fragment: Gen[String] = Gen.frequency(
    (4, Gen.listOfN(8, Gen.alphaNumChar).map(_.mkString + " words here ")),
    (2, Gen.oneOf("<p>", "</p>", "<div>", "</div>", "<a href=\"x\">", "</a>",
      "<br>", "<script>", "</script>", "<style>", "</style>", "<head>",
      "</head>", "<!--", "-->", "<!DOCTYPE html>")),
    (2, Gen.oneOf("&amp;", "&lt;", "&#65;", "&#x42;", "&bogus;", "&", "&&;")),
    (1, Gen.oneOf("<", ">", "<p", "href=\"a>b\"", "='", "\"", "<é>",
      "<1notatag>", "</", "<!")))

  private val soup: Gen[String] =
    Gen.listOfN(30, fragment).map(_.mkString)

  private def x(html: String): String =
    HtmlTextExtractor.extract(UTF8String.fromString(html), 10, 33).toString

  test("never throws and is deterministic on arbitrary tag soup") {
    samples(soup, 300).foreach { s =>
      val a = x(s)
      assert(a == x(s), s"nondeterministic on: $s")
    }
  }

  test("output never contains markup from handled tags or decoded entities") {
    samples(soup, 300).foreach { s =>
      val out = x(s)
      // block/skip tags never leak through; named entities decode
      assert(!out.contains("<p>") && !out.contains("</div>") &&
        !out.contains("<script>") && !out.contains("&amp;"), s"leak in: $s -> $out")
      // whitespace is normalized: no runs, no edge whitespace
      assert(!out.contains("  ") && out == out.trim, s"ws in: $s -> $out")
    }
  }

  test("plain text below every threshold edge survives verbatim") {
    val texts = samples(Gen.listOfN(12, Gen.alphaNumChar).map(_.mkString), 100)
    texts.foreach { t =>
      val body = s"some plain prose $t with enough length"
      assert(x(s"<p>$body</p>") == body)
    }
  }
}
