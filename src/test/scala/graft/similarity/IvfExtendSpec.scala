package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Rolling IVF ingest — [[IvfIndex.extendIndex]]'s contract: extending a
  * base index with batches against the FROZEN quantizer is EXACTLY a
  * from-scratch rebuild over the union (same vector → same argmin →
  * same cell), so probes cannot tell the two apart; and
  * [[IvfIndex.cellOccupancy]] surfaces drift as cell skew.
  */
class IvfExtendSpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select($"vec_id", $"embedding")

  test("extend twice ≡ rebuild over the union, frame-exactly; probes agree") {
    val base = emb.filter($"vec_id" % 4 =!= 0)
    val inc1 = emb.filter($"vec_id" % 8 === 0)
    val inc2 = emb.filter($"vec_id" % 8 === 4)
    val model = IvfIndex.train(base, "embedding", nCells = 8)

    val extended = IvfIndex.extendIndex(
      IvfIndex.extendIndex(
        IvfIndex.buildIndex(base, "vec_id", "embedding", model),
        inc1, "vec_id", "embedding"),
      inc2, "vec_id", "embedding")
    val rebuilt = IvfIndex.buildIndex(emb, "vec_id", "embedding", model)

    // identical (cell, id) assignment sets — the frozen-quantizer law
    val ea = extended.assignments.select($"cell", $"id")
    val ra = rebuilt.assignments.select($"cell", $"id")
    assert(ea.exceptAll(ra).isEmpty && ra.exceptAll(ea).isEmpty,
      "extended index diverged from a from-scratch rebuild")

    // probes over either index are indistinguishable
    val queries = emb.filter($"vec_id" % 10 === 0)
      .withColumn("vec_id", $"vec_id" + 1000000L)
    val pe = IvfIndex.probe(queries, extended, "vec_id", "embedding")
    val pr = IvfIndex.probe(queries, rebuilt, "vec_id", "embedding")
    assert(pe.exceptAll(pr).isEmpty && pr.exceptAll(pe).isEmpty)

    // increment copies are findable ONLY because the extension landed:
    // probing the un-extended base index must miss exact-1.0 for them
    val incQueries = inc1.withColumn("vec_id", $"vec_id" + 2000000L)
    val baseIdx = IvfIndex.buildIndex(base, "vec_id", "embedding", model)
    val missed = IvfIndex.probe(incQueries, baseIdx, "vec_id", "embedding")
      .filter($"best_cosine" === 1.0).count()
    val found = IvfIndex.probe(incQueries, extended, "vec_id", "embedding")
      .filter($"best_cosine" === 1.0).count()
    assert(found == inc1.count(), s"extended index must hold every increment: $found")
    assert(missed < found, "base index finding every increment copy at 1.0 " +
      "means the fixture has exact duplicates across the split — fix the split")
  }

  test("compactIndex: parquet round-trip is the same index, frame-exactly") {
    // the rolling-ingest maintenance step (r13 verdict #2): compaction
    // must be invisible to every consumer — assignments row-identical,
    // probes and occupancy frame-equal, model untouched
    val base = emb.filter($"vec_id" % 4 =!= 0)
    val inc = emb.filter($"vec_id" % 8 === 0)
    val model = IvfIndex.train(base, "embedding", nCells = 8)
    val extended = IvfIndex.extendIndex(
      IvfIndex.buildIndex(base, "vec_id", "embedding", model),
      inc, "vec_id", "embedding")
    val compacted = IvfIndex.compactIndex(extended, tmpDir("ivf-compact"))

    assert(compacted.model == extended.model)
    val ea = extended.assignments
    val ca = compacted.assignments
    assert(ea.exceptAll(ca).isEmpty && ca.exceptAll(ea).isEmpty,
      "assignments diverged under compaction")
    assert(ea.count() == ca.count())

    val queries = emb.filter($"vec_id" % 10 === 0)
      .withColumn("vec_id", $"vec_id" + 1000000L)
    val pe = IvfIndex.probe(queries, extended, "vec_id", "embedding")
    val pc = IvfIndex.probe(queries, compacted, "vec_id", "embedding")
    assert(pe.exceptAll(pc).isEmpty && pc.exceptAll(pe).isEmpty,
      "probe results diverged under compaction")

    val oe = IvfIndex.cellOccupancy(extended)
    val oc = IvfIndex.cellOccupancy(compacted)
    assert(oe.exceptAll(oc).isEmpty && oc.exceptAll(oe).isEmpty)
  }

  test("cellOccupancy: shares sum to 1 over nCells rows; drifted ingest skews") {
    val base = emb.filter($"vec_id" % 4 =!= 0)
    val model = IvfIndex.train(base, "embedding", nCells = 8)
    val idx = IvfIndex.buildIndex(base, "vec_id", "embedding", model)

    val occ = IvfIndex.cellOccupancy(idx).collect()
    assert(occ.length == 8, "every model cell must report, zeros included")
    assert(occ.map(_.getLong(1)).sum == base.count())
    val shareSum = occ.map(_.getDouble(2)).sum
    assert(math.abs(shareSum - 1.0) < 1e-3, s"shares sum to $shareSum")

    // a hard-drifted batch (every vector pushed far along one axis)
    // concentrates in few cells: max share must exceed the healthy max —
    // the skew signal the retrain rule watches
    val dim = emb.head.getSeq[Float](1).length
    val drifted = base.limit(200).select(
      ($"vec_id" + 5000000L).as("vec_id"),
      transform($"embedding".cast("array<double>"),
        (x, i) => when(i === 0, x + lit(50.0)).otherwise(x)).as("embedding"))
    assert(dim > 1)
    val after = IvfIndex.cellOccupancy(
      IvfIndex.extendIndex(idx, drifted, "vec_id", "embedding")).collect()
    val driftedIdx = IvfIndex.buildIndex(drifted, "vec_id", "embedding", model)
    val driftedCells = driftedIdx
      .assignments.select(countDistinct($"cell")).head.getLong(0)
    assert(driftedCells <= 2,
      s"a one-direction drift burst should land in very few cells, got $driftedCells")
    assert(after.map(_.getLong(1)).sum == base.count() + 200)
    // drained cells are REPORTED as zero rows — the strongest drift
    // signal must be visible, not absent from the report
    val driftedOcc = IvfIndex.cellOccupancy(driftedIdx).collect()
    assert(driftedOcc.length == 8)
    assert(driftedOcc.count(_.getLong(1) == 0L) >= 6,
      s"expected >= 6 drained cells reported as zeros: ${driftedOcc.mkString(", ")}")
  }
}
