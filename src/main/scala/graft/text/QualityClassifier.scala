package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.HashedLogit

/** Trainable quality classifier — the third leg of the quality pillar
  * beside the hand-built heuristics (q31) and the LM perplexity filter
  * (q88): a logistic regression over hashed word-unigram features,
  * trained distributed, scored as a per-row codegen dot product
  * (`graft_hash_logit`). This is the fastText-style quality-filter shape
  * most pretraining pipelines run (e.g. positives = curated reference
  * text, negatives = raw crawl).
  *
  * Training scale shape: the token→bucket hashing happens ONCE in a
  * single scan (the per-doc feature is just the bucket-index list — a
  * skinny cached RDD); each of the K full-batch gradient-descent
  * iterations is one `treeAggregate` pass producing dim+1 doubles per
  * partition with log-depth combining — no shuffle of row data, nothing
  * driver-side but the weight vector. K·(one pass over skinny features)
  * is the canonical distributed linear-model cost; the weight vector
  * broadcasts back out each iteration. Full-batch GD (not SGD) keeps the
  * run deterministic up to float summation order, which is what lets the
  * separation contract (q94) sit under the driver's hash gate.
  *
  * Scoring is [[HashedLogit]] — per-row, codegen, weights ride the plan.
  */
object QualityClassifier {

  /** Trained model: `weights(dim)` + bias, with the mean log-loss after
    * each iteration (lossHistory.head is the pre-update loss of the
    * initial all-zero model).
    */
  final case class Model(weights: Array[Double], bias: Double, lossHistory: Seq[Double]) {
    def score(text: Column): Column =
      call_function("graft_hash_logit", text,
        typedlit(weights.toSeq), lit(bias))
  }

  /** Full-batch logistic regression on hashed word-unigram counts.
    *
    * @param docs     training frame; `labelCol` must be 0/1-valued
    * @param dim      feature buckets (64-1024; collisions are the point)
    * @param iters    gradient-descent steps
    * @param lr       learning rate on the MEAN gradient — small enough
    *                 that the convex full-batch loss decreases each step
    */
  def train(
      docs: DataFrame,
      textCol: String,
      labelCol: String,
      dim: Int = 64,
      iters: Int = 40,
      lr: Double = 0.5
  ): Model = {
    require(dim > 0 && iters >= 0)
    val sc = docs.sparkSession.sparkContext
    // One scan hashes tokens to bucket indices; iterations touch only
    // (label, indices) — the skinny cached feature set.
    val feats = docs
      .select(col(labelCol).cast("double"), col(textCol).cast("string"))
      .rdd
      .map { r =>
        val y = r.getDouble(0)
        val text = if (r.isNullAt(1)) "" else r.getString(1)
        val idx = text.split(" ", -1).iterator
          .filter(_.nonEmpty)
          .map(HashedLogit.hashToken(_, dim))
          .toArray
        (y, idx)
      }
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = feats.count()
    require(n > 0, "cannot train on an empty frame")

    val w = Array.ofDim[Double](dim)
    var b = 0.0
    val losses = Vector.newBuilder[Double]
    for (_ <- 0 until iters) {
      val bw = sc.broadcast(w)
      val bb = b
      // One pass: gradient (dim buckets + bias in slot dim) AND loss.
      val (grad, lossSum) = feats.treeAggregate((Array.ofDim[Double](dim + 1), 0.0))(
        seqOp = { case ((g, l), (y, idx)) =>
          val wv = bw.value
          var z = bb
          var i = 0
          while (i < idx.length) { z += wv(idx(i)); i += 1 }
          // stable logistic pieces: p = σ(z), loss = log(1+e^-z) + (1-y)z
          val p = 1.0 / (1.0 + math.exp(-z))
          val loss =
            (if (z > 0) math.log1p(math.exp(-z)) else -z + math.log1p(math.exp(z))) +
              (1.0 - y) * z
          val gz = p - y
          i = 0
          while (i < idx.length) { g(idx(i)) += gz; i += 1 }
          g(dim) += gz
          (g, l + loss)
        },
        combOp = { case ((g1, l1), (g2, l2)) =>
          var i = 0
          while (i < g1.length) { g1(i) += g2(i); i += 1 }
          (g1, l1 + l2)
        })
      bw.destroy()
      losses += lossSum / n
      var j = 0
      while (j < dim) { w(j) -= lr * grad(j) / n; j += 1 }
      b -= lr * grad(dim) / n
    }
    feats.unpersist(blocking = false)
    // losses(k) is the mean log-loss of the weights AFTER k updates
    // (measured pre-update inside iteration k) — a strictly decreasing
    // sequence for a small-enough lr on this convex objective.
    Model(w, b, losses.result())
  }
}
