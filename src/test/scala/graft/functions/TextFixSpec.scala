package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class TextFixSpec extends AnyFunSuite {

  private def nfc(s: String): String =
    TextFixKernels.nfc(UTF8String.fromString(s)).toString
  private def fix(s: String): String =
    TextFixKernels.fixMojibake(UTF8String.fromString(s)).toString

  test("NFC composes combining sequences") {
    assert(nfc("é") == "é")
    assert(nfc("ö") == "ö")
    assert(nfc("Å") == "Å")
  }

  test("NFC is identity on ASCII and already-composed text, and idempotent") {
    assert(nfc("plain ascii 123") == "plain ascii 123")
    assert(nfc("éö") == "éö")
    val once = nfc("mélange ö")
    assert(nfc(once) == once)
  }

  test("mojibake round-trips through repair for Latin and CJK") {
    for (s <- Seq("café", "naïve", "Zürich",
        "日本語", "éèê mixed café end",
        "€ 9,99")) {
      val garbled = TextFixKernels.mojibake(s)
      assert(garbled != s, s"corruption model must change: $s")
      assert(fix(garbled) == s, s"repair failed for $s via $garbled")
    }
  }

  test("repair is identity on ASCII and on clean non-mojibake text") {
    assert(fix("plain ascii, nothing high") == "plain ascii, nothing high")
    // a lone genuine é: the 1-char run cannot be a multi-byte sequence
    assert(fix("café au lait") == "café au lait")
    // genuine Latin-1 prose whose high-char run is NOT valid UTF-8 bytes
    assert(fix("séén") == "séén")
  }

  test("all-or-nothing per run: an invalid tail keeps the whole run") {
    // Ã© decodes, but Ã©Ã (trailing lead byte, no continuation) must not
    val garbled = TextFixKernels.mojibake("é") + "Ã"
    assert(fix(garbled) == garbled)
  }

  test("runs repair independently across ASCII separators") {
    val s = "café and Zürich"
    val garbled = s.split(" ").map(TextFixKernels.mojibake).mkString(" ")
    assert(fix(garbled) == s)
  }

  test("repair is single-pass: double-encoding needs two applications") {
    val once = TextFixKernels.mojibake("café")
    val twice = TextFixKernels.mojibake(once)
    assert(fix(fix(twice)) == "café")
  }

  test("surrogate pairs and non-CP1252 chars pass through untouched") {
    val s = "emoji 😀 cyrillic ж done"
    assert(fix(s) == s && nfc(s) == s)
  }
}
