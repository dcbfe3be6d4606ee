package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit salting for skew-heavy shuffles — the manual complement to
  * AQE's skew-join splitting (which only kicks in when runtime stats
  * detect the skew; salting is the planned fix when the hot keys are
  * known or the join is recurring).
  *
  * The probe (large, skewed) side gets a deterministic salt derived from
  * a hash of its whole row; the build side is replicated once per salt
  * value. The join key becomes (key, salt), splitting each hot key's rows
  * across `saltFactor` reducers at the cost of build-side replication —
  * the classic trade: use it when probe skew dominates and the build side
  * is small enough to replicate (but too big / too dynamic to broadcast).
  */
object SaltedJoin {

  def inner(
      probe: DataFrame,
      build: DataFrame,
      keyCols: Seq[String],
      saltFactor: Int
  ): DataFrame = {
    require(saltFactor > 0)
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(probe.columns.map(col): _*), lit(saltFactor.toLong)).cast("int"))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted
      .join(replicated, keyCols :+ "__salt")
      .drop("__salt")
  }
}
