package graft.text

import graft.SparkSpec

class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  test("chunks respect maxTokens, prefer sentence boundaries, and lose nothing") {
    val text = "One two three. Four five six seven. Eight nine! Ten."
    val chunks = Chunker.chunk(Seq((1L, text)).toDS(), maxTokens = 7)
      .collect().sortBy(_.chunk_idx)
    assert(chunks.forall(_.n_tokens <= 7))
    // sentence-boundary preference: first chunk = first two sentences (3+4)
    assert(chunks(0).text == "One two three. Four five six seven.")
    assert(chunks(1).text == "Eight nine! Ten.")
    // nothing dropped, nothing duplicated
    assert(chunks.map(_.text).mkString(" ") == text)
    assert(chunks.map(_.n_tokens).sum == text.split("\\s+").length)
  }

  test("an oversized sentence hard-splits on token boundaries") {
    val long = (1 to 20).map(i => s"w$i").mkString(" ") + "."
    val chunks = Chunker.chunk(Seq((1L, long)).toDS(), maxTokens = 8)
      .collect().sortBy(_.chunk_idx)
    assert(chunks.map(_.n_tokens).toSeq == Seq(8, 8, 4))
    assert(chunks.flatMap(_.text.split(" ")).toSeq == long.split(" ").toSeq)
  }

  test("fuzz: random texts always chunk within budget and conserve tokens") {
    val rng = new scala.util.Random(7)
    val texts = (1 to 40).map { i =>
      val n = rng.nextInt(60)
      (i.toLong, (0 until n).map { _ =>
        val w = "w" * (1 + rng.nextInt(4))
        if (rng.nextInt(5) == 0) w + "." else w
      }.mkString(" "))
    }
    for (maxTokens <- Seq(1, 3, 16)) {
      val chunks = Chunker.chunk(texts.toDS(), maxTokens).collect()
      assert(chunks.forall(_.n_tokens <= maxTokens))
      val perDoc = chunks.groupBy(_.doc_id).view.mapValues(_.map(_.n_tokens).sum).toMap
      texts.foreach { case (id, t) =>
        val expected = t.split("\\s+").count(_.nonEmpty)
        assert(perDoc.getOrElse(id, 0) == expected, s"doc $id maxTokens $maxTokens")
      }
    }
  }

  test("chunking the documents corpus covers every token of every doc") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .selectExpr("doc_id", "text").as[(Long, String)]
    val agg = Chunker.chunk(docs, maxTokens = 64)
      .groupBy("doc_id").sum("n_tokens")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = docs.collect().map { case (id, t) =>
      id -> t.split("\\s+").count(_.nonEmpty).toLong
    }.toMap
    assert(agg == expected)
  }
}
