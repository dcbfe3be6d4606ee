package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

  /** One-cell model: everything co-cells, so dedup is global. */
  private val oneCell = IvfIndex.Model(Seq(Seq(0.0, 0.0)))

  test("greedy keep-first, NOT connected components: middle of a cosine chain survives") {
    // e=(1,0); c,d at ±θ with cosθ=0.92: cos(c,e)=cos(d,e)=0.92 ≥ τ but
    // cos(c,d)=cos2θ≈0.69 < τ. Component dedup would keep only c; greedy
    // keep-first keeps d too (its only τ-partner e has a LARGER id).
    val ct = 0.92
    val st = math.sqrt(1 - ct * ct)
    val vecs = Seq(
      (1L, Seq(ct, st)),
      (2L, Seq(ct, -st)),
      (3L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val kept = SemDedup.dedup(vecs, "vec_id", "embedding", oneCell, tau = 0.9)
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(kept == Map(1L -> true, 2L -> true, 3L -> false))
  }

  test("corpus gap property: no natural pair within an order of magnitude of tau") {
    // The q99 oracle-exactness argument needs every τ=0.95 edge in the
    // planted corpus to be a planted exact copy. Pin the gap on the real
    // testdata: max natural pairwise cosine stays below 0.8. (All-pairs
    // here is the test-only ground-truth pass, same as the q24 oracle.)
    val v = emb
      .select(col("vec_id").as("id"), VectorOps.toDouble(col("embedding")).as("v"))
      .withColumn("n", VectorOps.norm(col("v")))
    val r = v.as("x").join(v.as("y"), col("x.id") < col("y.id"))
      .select(VectorOps.cosineFromNorms(
        VectorOps.dot(col("x.v"), col("y.v")), col("x.n"), col("y.n")).as("c"))
      .agg(max(col("c")), min(col("c"))).head()
    assert(r.getDouble(0) < 0.8, s"corpus gap broken: max natural cosine ${r.getDouble(0)}")
    // Two-sided: q104's NEGATED novel vectors rely on no natural pair
    // being strongly anti-aligned either (cos(-a, b) = -cos(a, b)).
    assert(r.getDouble(1) > -0.8, s"corpus gap broken: min natural cosine ${r.getDouble(1)}")
  }

  test("probe: exact copies are flagged, negated novels are not, plan stays cell-keyed") {
    val model = IvfIndex.train(emb, "embedding", nCells = 8)
    val index = IvfIndex.buildIndex(emb, "vec_id", "embedding", model)
    val copies = emb.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val novels = emb.filter(col("vec_id") % 7 === 0)
      .select((col("vec_id") + 2000000L).as("vec_id"),
        transform(col("embedding"), x => -x).as("embedding"))
    val out = SemDedup.probe(
      copies.unionByName(novels), index, "vec_id", "embedding", tau = 0.95)
    assert(out.filter(col("id") < 2000000L && !col("has_duplicate")).count() == 0L)
    assert(out.filter(col("id") >= 2000000L && col("has_duplicate")).count() == 0L)
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("exact copies always co-cell under the deterministic tie-break") {
    val copies = emb.filter(col("vec_id") % 10 === 0)
      .withColumn("vec_id", col("vec_id") + 1000000L)
    val corpus = emb.unionByName(copies)
    val model = IvfIndex.train(corpus, "embedding", nCells = 8)
    val cells = corpus.select(
      col("vec_id"),
      IvfIndex.assignCell(VectorOps.toDouble(col("embedding")), model).as("cell"))
    val strays = cells.filter(col("vec_id") >= 1000000L)
      .withColumnRenamed("cell", "copy_cell")
      .withColumn("vec_id", col("vec_id") - 1000000L)
      .join(cells, "vec_id")
      .filter(col("copy_cell") =!= col("cell"))
      .count()
    assert(strays == 0L)
  }

  test("planted corpus verdict: every copy dropped, every original kept") {
    val copies = emb.filter(col("vec_id") % 10 === 0)
      .withColumn("vec_id", col("vec_id") + 1000000L)
    val corpus = emb.unionByName(copies)
    val model = IvfIndex.train(corpus, "embedding", nCells = 8)
    val out = SemDedup.dedup(corpus, "vec_id", "embedding", model, tau = 0.95)
    assert(out.filter(col("id") >= 1000000L && col("kept")).count() == 0L)
    assert(out.filter(col("id") < 1000000L && !col("kept")).count() == 0L)
  }

  test("survivorWeights: mass attributed to a dropped absorber is dropped with it") {
    // Chain 1~2~3 (but not 1~3): greedy drops 2 (partner 1) and 3
    // (partner 2). 3's absorber 2 is itself dropped, so its mass is NOT
    // chained onto 1 — survivor 1 carries only itself plus 2.
    val ct = 0.92
    val st = math.sqrt(1 - ct * ct)
    val vecs = Seq(
      (1L, Seq(ct, st)),
      (2L, Seq(1.0, 0.0)),
      (3L, Seq(ct, -st))).toDF("vec_id", "embedding")
    val w = SemDedup.survivorWeights(vecs, "vec_id", "embedding", oneCell, tau = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w == Map(1L -> 2L))
  }

  test("survivorWeights on the planted corpus: copies' mass lands on their originals") {
    val copies = emb.filter(col("vec_id") % 10 === 0)
      .withColumn("vec_id", col("vec_id") + 1000000L)
    val corpus = emb.unionByName(copies)
    val model = IvfIndex.train(corpus, "embedding", nCells = 8)
    val w = SemDedup.survivorWeights(corpus, "vec_id", "embedding", model, tau = 0.95)
    assert(w.agg(sum(col("weight"))).head().getLong(0) == corpus.count())
    assert(w.filter(col("id") % 10 === 0 && col("weight") =!= 2L).count() == 0L)
    assert(w.filter(col("id") % 10 =!= 0 && col("weight") =!= 1L).count() == 0L)
  }

  test("durable checkpoint mode is identical to ephemeral for dedup/probe/survivorWeights") {
    val dir = java.nio.file.Files.createTempDirectory("semdedup-ckpt").toString
    val copies = emb.filter(col("vec_id") % 10 === 0)
      .withColumn("vec_id", col("vec_id") + 1000000L)
    val corpus = emb.unionByName(copies)
    val model = IvfIndex.train(corpus, "embedding", nCells = 8)
    for (p <- Seq(2, 16)) {
      val rp = corpus.repartition(p)
      val d0 = SemDedup.dedup(rp, "vec_id", "embedding", model, tau = 0.95)
      val d1 = SemDedup.dedup(rp, "vec_id", "embedding", model, tau = 0.95,
        checkpointDir = Some(s"$dir/dedup$p"))
      assert(d1.exceptAll(d0).isEmpty && d0.exceptAll(d1).isEmpty, s"dedup p=$p")
      val w0 = SemDedup.survivorWeights(rp, "vec_id", "embedding", model, tau = 0.95)
      val w1 = SemDedup.survivorWeights(rp, "vec_id", "embedding", model, tau = 0.95,
        checkpointDir = Some(s"$dir/weights$p"))
      assert(w1.exceptAll(w0).isEmpty && w0.exceptAll(w1).isEmpty, s"weights p=$p")
    }
    val index = IvfIndex.buildIndex(emb, "vec_id", "embedding", model)
    val batch = copies.select(col("vec_id"), col("embedding"))
      .unionByName(emb.filter(col("vec_id") % 7 === 0)
        .select((col("vec_id") + 2000000L).as("vec_id"),
          transform(col("embedding"), x => -x).as("embedding")))
    val p0 = SemDedup.probe(batch, index, "vec_id", "embedding", tau = 0.95)
    val p1 = SemDedup.probe(batch, index, "vec_id", "embedding", tau = 0.95,
      checkpointDir = Some(s"$dir/probe"))
    assert(p1.exceptAll(p0).isEmpty && p0.exceptAll(p1).isEmpty)
  }

  test("plan: candidate pairing is a shuffle equi-join on cell, never all-pairs") {
    val model = IvfIndex.train(emb, "embedding", nCells = 8)
    val p = SemDedup.dedup(emb, "vec_id", "embedding", model, tau = 0.95)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
  }
}
