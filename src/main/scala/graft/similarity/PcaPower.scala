package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Top principal direction of an embedding corpus by power iteration —
  * in EXACT integer arithmetic end to end, so every round is replayable
  * move-for-move by another engine (the q141 PageRank discipline applied
  * to linear algebra).
  *
  * Dataflow (100 TB shape):
  *  1. quantize: each float component → `round(x · 2^qBits)` as int64
  *     (multiplying a double by a power of two is EXACT, so the only
  *     rounding is the final half-away-from-zero to an integer — an
  *     operation both Spark and DuckDB agree on bit-for-bit).
  *  2. gram: G[a][b] = Σ_vec qx[a]·qx[b], built by double posexplode of
  *     each row's own quantized array — N·dim² product terms reduce
  *     map-side into ≤ dim² partial sums per partition, so the only
  *     shuffle is dim² rows regardless of corpus size.
  *  3. normalize: G div N (sign-split truncating division, identical in
  *     Scala and SQL) bounds every later product independent of N:
  *     |G/N| ≤ maxAbs²·2^(2·qBits), so w = G·v stays < 2^63 for any
  *     corpus size.
  *  4. iterate T rounds on the DRIVER over the collected dim×dim gram
  *     (bounded: dim² longs — the IvfIndex bounded-driver-structure
  *     pattern): w = G·v, then rescale v' = (w · 2^vBits) div max|w|,
  *     again sign-split. All Long ops, no floating point anywhere.
  *
  * The iteration trace (every v of every round) and the per-vector
  * projections onto the final direction are both exposed as DataFrames;
  * [[oracleSql]] generates the DuckDB CTE chain that replays the same
  * integer moves, so the hash gate covers the ITERATION, not just the
  * output shape.
  */
object PcaPower {

  /** Per-component quantized view: (vec_id, d, qx) with d 0-based. */
  def quantize(emb: DataFrame, qBits: Int): DataFrame =
    emb.select(col("vec_id"),
      posexplode(col("embedding").cast("array<double>")).as(Seq("d", "x")))
      .select(col("vec_id"), col("d"),
        round(col("x") * (1L << qBits), 0).cast("long").as("qx"))

  /** Distributed gram matrix of the quantized corpus: (da, db, g) with
    * g = Σ qx_da · qx_db. In-row pair expansion — no self-join, no
    * shuffle of the N·dim quantized frame; the exchange carries ≤ dim²
    * rows of partial sums.
    */
  def gram(emb: DataFrame, qBits: Int): DataFrame = {
    val q = emb.select(
      expr(s"transform(cast(embedding as array<double>), x -> cast(round(x * ${1L << qBits}, 0) as bigint))")
        .as("q"))
    q.select(col("q"), posexplode(col("q")).as(Seq("da", "xa")))
      .select(col("da"), col("xa"), posexplode(col("q")).as(Seq("db", "xb")))
      .groupBy(col("da"), col("db"))
      .agg(sum(col("xa") * col("xb")).as("g"))
  }

  /** Truncate-toward-zero integer division, sign-split so the SQL replay
    * (`//` floors in DuckDB) matches exactly on negatives.
    */
  private def tdiv(a: Long, b: Long): Long =
    if (a < 0) -((-a) / b) else a / b

  /** Power-iterate on the collected gram. Returns the trace: iteration
    * 0 is the all-ones start; each later v is rescaled to |v| ≤ 2^vBits.
    */
  def iterate(g: Array[Array[Long]], nVec: Long, iters: Int, vBits: Int): Seq[Array[Long]] = {
    val dim = g.length
    val gn = g.map(_.map(tdiv(_, nVec)))
    var v = Array.fill(dim)(1L)
    val trace = Seq.newBuilder[Array[Long]]
    trace += v
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dim) { a =>
        var acc = 0L
        var b = 0
        while (b < dim) { acc += gn(a)(b) * v(b); b += 1 }
        acc
      }
      val s = w.map(math.abs).max
      require(s > 0, "gram·v vanished — degenerate corpus")
      v = w.map(x => tdiv(x * (1L << vBits), s))
      trace += v
    }
    trace.result()
  }

  /** Full fit: distributed gram → driver iteration → trace DataFrame
    * (iter, d, v), one row per component per round including round 0.
    */
  def fitTrace(s: SparkSession, emb: DataFrame, qBits: Int, vBits: Int, iters: Int): DataFrame = {
    import s.implicits._
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val nVec = emb.count()
    val gRows = gram(emb, qBits).collect()
    val g = Array.ofDim[Long](dim, dim)
    gRows.foreach(r => g(r.getInt(0))(r.getInt(1)) = r.getLong(2))
    val trace = iterate(g, nVec, iters, vBits)
    trace.zipWithIndex
      .flatMap { case (v, it) => v.zipWithIndex.map { case (x, d) => (it, d, x) } }
      .toDF("iter", "d", "v")
  }

  /** Exact integer projection of every vector onto the final iterate:
    * proj = Σ_d qx[d] · v[d]. The direction is a broadcast 64-row join.
    */
  def project(s: SparkSession, emb: DataFrame, qBits: Int, vBits: Int, iters: Int): DataFrame = {
    val trace = fitTrace(s, emb, qBits, vBits, iters)
    val vFinal = broadcast(
      trace.filter(col("iter") === iters).select(col("d"), col("v")))
    quantize(emb, qBits)
      .join(vFinal, "d")
      .groupBy(col("vec_id"))
      .agg(sum(col("qx") * col("v")).as("proj"))
      .orderBy("vec_id")
  }

  /** DuckDB replay of the whole pipeline: quantize → gram → div-N
    * normalize → T unrolled power rounds → trace (or projection). The
    * CTE chain is generated for the same (qBits, vBits, iters), so both
    * engines execute the identical integer moves.
    */
  def oracleCtes(qBits: Int, vBits: Int, iters: Int): String = {
    val qScale = 1L << qBits
    val vScale = 1L << vBits
    val rounds = (1 to iters).map { t =>
      s"""w$t AS (
         |  SELECT gn.da AS d, sum(gn.g * v.v) AS w
         |  FROM gn JOIN v${t - 1} v ON gn.db = v.d GROUP BY 1),
         |s$t AS (SELECT max(abs(w)) AS s FROM w$t),
         |v$t AS (
         |  SELECT d, (CASE WHEN w < 0 THEN -(((-w) * $vScale) // s)
         |             ELSE (w * $vScale) // s END)::BIGINT AS v
         |  FROM w$t, s$t)""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS (
       |  SELECT vec_id, d - 1 AS d, round(CAST(x AS DOUBLE) * $qScale)::BIGINT AS qx
       |  FROM (SELECT vec_id, unnest(embedding) AS x,
       |          generate_subscripts(embedding, 1) AS d FROM embeddings)),
       |g0 AS (
       |  SELECT a.d AS da, b.d AS db, sum(a.qx * b.qx) AS g
       |  FROM q a JOIN q b USING (vec_id) GROUP BY 1, 2),
       |nv AS (SELECT count(*) AS c FROM embeddings),
       |gn AS (
       |  SELECT da, db, (CASE WHEN g < 0 THEN -((-g) // c) ELSE g // c END)::BIGINT AS g
       |  FROM g0, nv),
       |v0 AS (SELECT DISTINCT da AS d, 1::BIGINT AS v FROM gn),
       |$rounds""".stripMargin
  }

  def traceOracle(qBits: Int, vBits: Int, iters: Int): String = {
    val selects = (0 to iters)
      .map(t => s"SELECT $t AS iter, d, v FROM v$t")
      .mkString("\n  UNION ALL ")
    s"""${oracleCtes(qBits, vBits, iters)}
       |SELECT iter, d, v FROM (
       |  $selects)
       |ORDER BY iter, d""".stripMargin
  }

  def projectOracle(qBits: Int, vBits: Int, iters: Int): String =
    s"""${oracleCtes(qBits, vBits, iters)}
       |SELECT q.vec_id, sum(q.qx * v.v)::BIGINT AS proj
       |FROM q JOIN v$iters v USING (d)
       |GROUP BY 1 ORDER BY 1""".stripMargin
}
