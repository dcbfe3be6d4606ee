package graft.operators

import graft.SparkSpec

class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  // Two triangles joined by one bridge edge — the canonical two-community
  // graph. Undirected: both directions passed explicitly (caller owns
  // orientation).
  private def twoTriangles = {
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L),
      (3L, 4L))
    (und ++ und.map(_.swap)).toDF("src", "dst")
  }

  test("two triangles converge to two communities labeled by their exemplars") {
    val labels = LabelPropagation.run(twoTriangles, iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // self-vote + smallest-label tie-break pulls each triangle to its
    // minimum id; the bridge does not merge them in 4 rounds
    assert(labels.keySet == (1L to 6L).toSet)
    assert(Set(labels(1L), labels(2L)).size == 1)
    assert(Set(labels(4L), labels(5L), labels(6L)).size == 1)
  }

  test("deterministic across runs") {
    val a = LabelPropagation.run(twoTriangles, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = LabelPropagation.run(twoTriangles, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("durable checkpointing yields identical labels (the 100-TB mode)") {
    val dir = tmpDir("labelprop-ckpt")
    val ephemeral = LabelPropagation.run(twoTriangles, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val durable = LabelPropagation
      .run(twoTriangles, iterations = 3, checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(durable == ephemeral)
    for (t <- Seq("edges", "labels0", "labels1", "labels2", "labels3"))
      assert(new java.io.File(dir, t).exists(), s"missing durable round $t")
  }
}
