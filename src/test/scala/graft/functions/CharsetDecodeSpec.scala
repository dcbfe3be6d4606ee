package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_decode` ([[CharsetKernels]]) — per-row charset-aware byte
  * decode, browser semantics: follow the label, never sniff, never
  * throw (malformed/unmappable → U+FFFD, unknown label → UTF-8).
  */
class CharsetDecodeSpec extends SparkSpec {
  import spark.implicits._

  private def dec(bytes: Array[Byte], label: String): String =
    CharsetKernels.decode(bytes, UTF8String.fromString(label)).toString

  test("kernel: the declared charset drives the decode, aliases resolve") {
    val s = "café € œ" // é € œ
    assert(dec(s.getBytes("UTF-8"), "utf-8") == s)
    assert(dec(s.getBytes("windows-1252"), "windows-1252") == s)
    assert(dec(s.getBytes("windows-1252"), "CP1252") == s)
    val latin = "café ±"
    assert(dec(latin.getBytes("ISO-8859-1"), "latin-1") == latin)
    assert(dec(latin.getBytes("ISO-8859-1"), "latin1") == latin)
    assert(dec(latin.getBytes("ISO-8859-1"), "ISO8859-1") == latin)
  }

  test("kernel: mislabel decodes per the LABEL (deterministic mojibake, " +
      "no sniffing); unknown labels fall back to UTF-8") {
    // UTF-8 'é' (C3 A9) read as Latin-1 → 'Ã©'
    assert(dec("café".getBytes("UTF-8"), "iso-8859-1") ==
      "cafÃ©")
    assert(dec("café".getBytes("UTF-8"), "klingon-7") == "café")
    assert(dec("café".getBytes("UTF-8"), "") == "café")
  }

  test("kernel: malformed input decodes to U+FFFD, never throws") {
    // a lone UTF-8 continuation byte is malformed
    val bad = Array[Byte]('a'.toByte, 0xA9.toByte, 'b'.toByte)
    assert(dec(bad, "utf-8") == "a�b")
    // unmappable is impossible for the decoding direction of the
    // charsets we route, but the policy is set — assert no throw on
    // arbitrary bytes through a multibyte charset
    val junk = Array.tabulate[Byte](64)(i => (i * 37).toByte)
    assert(dec(junk, "utf-16").nonEmpty)
  }

  test("kernel: adversarial labels are bounded — overlong junk labels " +
      "fall back to UTF-8 and a junk-label flood cannot grow memory " +
      "unboundedly, but an over-cap REAL label still resolves") {
    // labels are attacker-controlled Content-Type parameters: over the
    // length cap the CACHE is skipped but resolution still runs —
    // junk falls back to UTF-8 like any unknown label
    val long = "x" * 200
    assert(dec("café".getBytes("UTF-8"), long) == "café")
    // the one registered IANA name longer than the cap (45 chars) must
    // decode as EUC-JP, not forced-UTF-8 mojibake (r17 ADVICE)
    val eucjp = "Extended_UNIX_Code_Packed_Format_for_Japanese"
    assert(eucjp.length > 40)
    assert(dec("日本語".getBytes("EUC-JP"), eucjp) == "日本語")
    // a flood of unique junk labels stays correct (each falls back to
    // UTF-8); the cache size cap is internal, this pins the behavior
    // under exactly the minting pattern the cap defends against
    (0 until 3000).foreach { i =>
      assert(dec("ok".getBytes("UTF-8"), s"junk-charset-$i") == "ok")
    }
  }

  test("graft_decode end to end in SQL with a per-row charset column") {
    val rows = Seq(
      ("café".getBytes("UTF-8"), "utf-8"),
      ("café".getBytes("ISO-8859-1"), "iso-8859-1"),
      ("café €".getBytes("windows-1252"), "windows-1252"))
      .toDF("body", "cs")
    val got = rows
      .select(call_function("graft_decode", col("body"), col("cs")).as("t"))
      .as[String].collect().toSeq
    assert(got == Seq("café", "café", "café €"), s"$got")
    // null body → null out (null charset is the CALLER's coalesce)
    val n = Seq((null: Array[Byte], "utf-8")).toDF("body", "cs")
      .select(call_function("graft_decode", col("body"), col("cs")))
      .collect().head
    assert(n.isNullAt(0))
  }
}
