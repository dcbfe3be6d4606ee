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

  /** float[] parquet embeddings → array<double> for stable arithmetic.
    * A direct array cast, NOT transform(_.cast): higher-order functions
    * are CodegenFallback and would knock the surrounding projection (and
    * the dot-product loop with it) out of whole-stage codegen.
    */
  def toDouble(v: Column): Column = v.cast("array<double>")

  /** Native codegen'd expression ([[graft.functions.DotProduct]]) — a
    * tight primitive loop instead of the zip_with+aggregate HOF pair,
    * which allocates an intermediate array per call. Same left-to-right
    * summation order, so values are unchanged.
    */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def norm(v: Column): Column = sqrt(dot(v, v))

  /** dot(a,b) / (na·nb), null when either norm is 0 — a zero vector has
    * no defined cosine, and under the engine's pinned ANSI mode an
    * unguarded 0-divisor division would abort the whole query instead.
    * Use with precomputed norm columns to avoid re-deriving norms per
    * pair.
    */
  def cosineFromNorms(dotAB: Column, na: Column, nb: Column): Column =
    when(na * nb > 0, dotAB / (na * nb))

  /** Cosine similarity (null for zero vectors); callers with precomputed
    * norms should use [[cosineFromNorms]] instead of re-deriving norms
    * per pair.
    */
  def cosine(a: Column, b: Column): Column =
    cosineFromNorms(dot(a, b), norm(a), norm(b))
}
