package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loader for the engine's standard parquet tables.
  *
  * Normalizes nanosecond-precision parquet timestamps: Spark reads
  * TIMESTAMP(NANOS) columns as LongType (under
  * `spark.sql.legacy.parquet.nanosAsLong=true`, set by EngineSession —
  * the reader rejects them outright otherwise) while every other engine
  * (DuckDB, pandas) reads them as µs timestamps. `ts div 1000` restores
  * timestamp semantics; integer division ≡ the truncating µs read.
  */
object Tables {

  /** Column names that are nanosecond epochs when they surface as longs. */
  private val nanosColumns = Set("ts")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"${dir.stripSuffix("/")}/$name.parquet")
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.dataType == LongType && nanosColumns.contains(f.name))
        // Integral `div`, not `/`: float division of an epoch-ns long
        // (~1.7e18 > 2^53) would lose µs precision through the double.
        d.withColumn(f.name, timestamp_micros(expr(s"`${f.name}` div 1000")))
      else d
    }
  }
}
