package graft.functions

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

class DeflateSpec extends SparkSpec {

  test("inflate ∘ deflate is the identity (round-trip across edge shapes)") {
    val cases = Seq(
      "", "a", "hello world",
      "ab" * 4096,                       // highly repetitive, > one buffer
      (0 until 3000).map(i => (i * 7919) % 97).mkString(" "), // noisy
      "naïve — déjà vu ✓ 日本語")       // multi-byte UTF-8
    cases.foreach { s =>
      val bytes = s.getBytes(UTF_8)
      val back = DeflateKernel.inflateBytes(DeflateKernel.deflateBytes(bytes))
      assert(java.util.Arrays.equals(back, bytes), s"round-trip failed for ${s.take(20)}")
    }
  }

  test("deflatedLength equals the materialized payload's length") {
    val cases = Seq("", "xyz", "the quick brown fox " * 50)
    cases.foreach { s =>
      assert(DeflateKernel.deflatedLength(UTF8String.fromString(s)) ==
        DeflateKernel.deflateBytes(s.getBytes(UTF_8)).length)
    }
  }

  test("repetitive text compresses far below prose of the same length") {
    val prose = (0 until 500).map(i => s"w${(i * 7919) % 1000}").mkString(" ")
    val repetitive = ("spam " * (prose.length / 5 + 1)).take(prose.length)
    val rProse = DeflateKernel.deflatedLength(UTF8String.fromString(prose)).toDouble / prose.length
    val rRep = DeflateKernel.deflatedLength(UTF8String.fromString(repetitive)).toDouble / repetitive.length
    assert(rRep < rProse / 3, s"repetitive $rRep vs prose $rProse")
  }

  test("graft_deflate_len runs as a column expression with null propagation") {
    import spark.implicits._
    val df = Seq(Some("hello hello hello hello"), None, Some(""))
      .toDF("text")
      .select(call_function("graft_deflate_len", col("text")).as("dl"))
    val rows = df.collect().map(r => if (r.isNullAt(0)) -1 else r.getInt(0))
    // empty input still emits the final empty DEFLATE block (2 bytes)
    assert(rows(0) > 0 && rows(1) == -1 &&
      rows(2) == DeflateKernel.deflatedLength(UTF8String.fromString("")))
  }

  test("expression result matches the kernel row by row on real-ish text") {
    import spark.implicits._
    val texts = (0 until 100).map(i => s"doc $i " + ("tok " * (i % 17)))
    val got = texts.toDF("text")
      .select(call_function("graft_deflate_len", col("text")).as("dl"))
      .as[Int].collect()
    val want = texts.map(t => DeflateKernel.deflatedLength(UTF8String.fromString(t)))
    assert(got.toSeq == want)
  }
}
