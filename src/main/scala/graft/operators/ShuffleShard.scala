package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus shuffle + shard assignment — the data-ordering
  * step of a training-data export. Pretraining reproducibility needs the
  * corpus order to be a pure function of the data (re-running the
  * pipeline, or re-running one failed shard, must produce byte-identical
  * shard files), so the permutation is keyed by md5 of the document id:
  * shard = top hex bits mod nShards, order within a shard = (md5, id).
  * Nothing here is engine-defined randomness — DuckDB recomputes the
  * whole assignment exactly (q100), unlike `rand(seed)`-based shuffles
  * whose value sequence is partitioning-dependent.
  *
  * Scale shape: ONE shuffle, keyed by shard, plus an in-partition sort —
  * exactly the physical layout a sharded write needs
  * (`partitionBy(shard)` files come out internally sorted). The window
  * is partitioned by shard, never global: with nShards sized to the
  * corpus (100 TB / 100k shards ≈ 1 GB per shard) each partition sorts
  * independently. The md5 key distributes uniformly, so shards are
  * balanced within sampling error by construction — no salting needed.
  */
object ShuffleShard {

  /** Integer value of the first four hex digits of `h` (0..65535) —
    * arithmetic on instr/substring so the oracle can mirror it
    * symbol-for-symbol (no BASE conversion builtins shared by both
    * engines).
    */
  private[operators] def hex4(h: Column): Column =
    Seq(4096, 256, 16, 1).zipWithIndex.map { case (mult, i) =>
      (instr(lit("0123456789abcdef"), substring(h, i + 1, 1)) - 1) * lit(mult)
    }.reduce(_ + _)

  /** Long value of the first `digits` hex chars of `h` (digits ≤ 15) —
    * the general form of [[hex4]], long-cast per term so an 8-digit
    * fingerprint (values to 2^32) cannot overflow int arithmetic. Same
    * instr/substring formulation, so oracles mirror it symbol-for-symbol.
    */
  private[graft] def hexLong(h: Column, digits: Int): Column = {
    require(digits >= 1 && digits <= 15, s"digits $digits outside [1, 15]")
    (0 until digits).map { i =>
      (instr(lit("0123456789abcdef"), substring(h, i + 1, 1)) - 1).cast("long") *
        lit(1L << (4 * (digits - 1 - i)))
    }.reduce(_ + _)
  }

  /** (id, shard, pos): deterministic shard in [0, nShards) and 1-based
    * position within the shard. `nShards` must be ≤ 65536 (the key draws
    * 16 bits; enough for ~64 TB of 1 GB shards — double the hex digits
    * for more).
    */
  def assign(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0 && nShards <= 65536, s"nShards $nShards outside [1, 65536]")
    val keyed = df.select(
      col(idCol).as("id"),
      md5(col(idCol).cast("string")).as("h"))
    val sharded = keyed.withColumn(
      "shard", pmod(hex4(col("h")), lit(nShards)).cast("long"))
    sharded
      .withColumn("pos",
        row_number().over(
          Window.partitionBy(col("shard")).orderBy(col("h"), col("id"))).cast("long"))
      .select("id", "shard", "pos")
  }
}
