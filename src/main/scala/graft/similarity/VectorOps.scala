package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector arithmetic over `array<double>` embeddings.
  *
  * Everything is built from codegen'd higher-order functions (zip_with +
  * aggregate) — no UDFs, so the expressions inline into whole-stage
  * codegen and the arithmetic is plain sequential double ops (which also
  * makes results bit-reproducible against other engines evaluating the
  * same order).
  */
object VectorOps {

  /** float[] parquet embeddings → array<double> for stable arithmetic. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity; callers with precomputed norms should use
    * dot(a,b) / (normA * normB) directly instead of re-deriving norms per
    * pair.
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
