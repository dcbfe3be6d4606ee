package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.core.{FileFormat, SourceSpec}

/** Mirrors tests/unit/test_extractor.py. */
class ReadersSpec extends SparkSpec {

  private def write(dir: String, name: String, content: String): String = {
    val p = Paths.get(dir, name)
    Files.write(p, content.getBytes(StandardCharsets.UTF_8))
    p.toString
  }

  test("S4: format dispatch goldens (test_extractor.py:53-70)") {
    assert(FileFormat.fromPath("a/b.csv").contains(FileFormat.Csv))
    assert(FileFormat.fromPath("a/B.CSV").contains(FileFormat.Csv))
    assert(FileFormat.fromPath("x.json").contains(FileFormat.Json))
    assert(FileFormat.fromPath("x.jsonl").contains(FileFormat.Json))
    assert(FileFormat.fromPath("x.parquet").contains(FileFormat.Parquet))
    assert(FileFormat.fromPath("x.txt").isEmpty)
    assert(FileFormat.fromPath("noext").isEmpty)
  }

  test("S1/S5: single CSV with header + inferred schema (test_extractor.py:72-78)") {
    val dir = tmpDir("readers")
    val p = write(dir, "sales.csv",
      "order_id,quantity,unit_price\nORD001,1,9.99\nORD002,2,19.98\n")
    val df = Readers.single(spark, p)
    assert(df.count() == 2)
    assert(df.columns.toSeq == Seq("order_id", "quantity", "unit_price"))
    assert(df.schema("quantity").dataType.typeName == "integer")
  }

  test("S2: JSON-lines scan") {
    val dir = tmpDir("readers")
    val p = write(dir, "recs.json",
      """{"order_id":"A","qty":1}""" + "\n" + """{"order_id":"B","qty":2}""" + "\n")
    val df = Readers.single(spark, p)
    assert(df.count() == 2)
    assert(df.columns.sorted.toSeq == Seq("order_id", "qty"))
  }

  test("unsupported format rejected (test_extractor.py:80-83)") {
    intercept[IllegalArgumentException](Readers.single(spark, "/tmp/file.txt"))
  }

  test("max_file_size_mb: oversized single file errors before parse (config.yaml:79)") {
    val dir = tmpDir("readers")
    val p = write(dir, "big.csv", "x\n" + "1\n" * 100)
    // limit 0 MB: any non-empty file is oversize — exercises the guard
    // without materializing a 100 MB fixture
    val e = intercept[IllegalArgumentException](
      Readers.single(spark, p, maxFileSizeMb = Some(0L)))
    assert(e.getMessage.contains("max_file_size_mb"))
    assert(Readers.single(spark, p, maxFileSizeMb = Some(1L)).count() == 100)
  }

  test("max_file_size_mb: batch skips the oversized file, keeps the rest") {
    val dir = tmpDir("readers")
    write(dir, "ok.csv", "x\n1\n2\n")
    val bigRows = 600000 // "1\n" * 600k ≈ 1.2 MB — over a 1 MB limit
    write(dir, "big.csv", "x\n" + "1\n" * bigRows)
    assert(Readers.batch(spark, dir).count() == bigRows + 2) // no limit: both read
    // per-file isolation: big.csv skipped with a warning, ok.csv survives
    assert(Readers.batch(spark, dir, maxFileSizeMb = Some(1L)).count() == 2)
    // all files over the limit → empty frame, not a crash (S8 contract)
    assert(Readers.batch(spark, dir, maxFileSizeMb = Some(0L)).count() == 0)
  }

  test("S6: listing filters to supported formats (test_extractor.py:107-113)") {
    val dir = tmpDir("readers")
    write(dir, "a.csv", "x\n1\n")
    write(dir, "b.txt", "junk")
    write(dir, "c.json", """{"x":1}""" + "\n")
    val listed = Readers.listSupported(spark, dir)
    assert(listed.size == 2)
    assert(listed.forall(p => p.endsWith("a.csv") || p.endsWith("c.json")))
  }

  test("S7: batch outer-aligns drifted schemas by name (pd.concat semantics)") {
    val dir = tmpDir("readers")
    write(dir, "one.csv", "order_id,product\nA,x\n")
    write(dir, "two.csv", "order_id,price\nB,9.99\n")
    val df = Readers.batch(spark, dir)
    assert(df.count() == 2)
    assert(df.columns.sorted.toSeq == Seq("order_id", "price", "product"))
    // missing columns null-filled, like pd.concat
    assert(df.filter(df("product").isNull).count() == 1)
    assert(df.filter(df("price").isNull).count() == 1)
  }

  test("S7: per-file failure isolation — bad file skipped, rest read") {
    val dir = tmpDir("readers")
    write(dir, "good.csv", "x,y\n1,2\n")
    // a parquet-extension file with garbage bytes fails its reader
    write(dir, "bad.parquet", "this is not parquet")
    val df = Readers.batch(spark, dir)
    assert(df.count() == 1)
  }

  test("S8: empty dir → empty frame (test_extractor.py:115-127)") {
    val dir = tmpDir("readers-empty")
    val df = Readers.batch(spark, dir)
    assert(df.columns.isEmpty)
  }

  test("S9: source router (test_extractor.py:85-105)") {
    val dir = tmpDir("readers")
    val p = write(dir, "f.csv", "x\n1\n")
    val pendingDir = s"$dir/base/pending"
    Files.createDirectories(Paths.get(pendingDir))
    write(pendingDir, "g.csv", "x\n1\n2\n")
    assert(Readers.extract(spark, SourceSpec.SingleFile(p)).count() == 1)
    assert(Readers.extract(spark, SourceSpec.Batch(dir)).count() >= 1)
    assert(Readers.extract(spark, SourceSpec.Scheduled(s"$dir/base")).count() == 2)
  }

  test("SourceSpec.fromEvent routing (lambda_handler.py:155-197)") {
    assert(SourceSpec.fromEvent(Map("path" -> "/x.csv")) == SourceSpec.SingleFile("/x.csv"))
    assert(SourceSpec.fromEvent(Map("type" -> "batch", "dir" -> "/d")) == SourceSpec.Batch("/d"))
    assert(SourceSpec.fromEvent(Map("type" -> "scheduled", "base_dir" -> "/b"))
      == SourceSpec.Scheduled("/b"))
    intercept[IllegalArgumentException](SourceSpec.fromEvent(Map("nope" -> "x")))
  }
}

class SchemaDriftSpec extends graft.SparkSpec {
  import spark.implicits._

  test("batch union coerces type-conflicting columns to string (pd.concat semantics)") {
    val dir = tmpDir("drift")
    Seq((1L, 10L)).toDF("id", "v").write.parquet(s"$dir/a.parquet")
    Seq((2L, "ten")).toDF("id", "v").write.parquet(s"$dir/b.parquet")
    val got = Readers.batch(spark, dir)
    assert(got.count() == 2)
    assert(got.schema("v").dataType.typeName == "string")
    assert(got.select("v").as[String].collect().toSet == Set("10", "ten"))
  }
}
