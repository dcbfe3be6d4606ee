package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loader for the engine's standard parquet tables.
  *
  * Normalizes event timestamps to session-TZ TimestampType regardless of
  * how the parquet encodes them — the testdata has shipped BOTH forms
  * across regenerations:
  *   - TIMESTAMP(NANOS): Spark reads the column as LongType (under
  *     `spark.sql.legacy.parquet.nanosAsLong=true`, set by EngineSession
  *     — the reader rejects it outright otherwise) while every other
  *     engine (DuckDB, pandas) reads a µs-truncated timestamp. `ts div
  *     1000` restores timestamp semantics; integer division ≡ the
  *     truncating µs read.
  *   - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads
  *     TIMESTAMP_NTZ; the session TZ is pinned UTC, so a plain cast to
  *     TimestampType is value-identical and keeps every downstream
  *     consumer (windows, `Row.getTimestamp`, Verify's NTZ dump cast)
  *     on the TimestampType contract the engine was built against.
  */
object Tables {

  /** Column names that are event-time epochs needing normalization. */
  private val nanosColumns = Set("ts")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"${dir.stripSuffix("/")}/$name.parquet")
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.dataType == LongType && nanosColumns.contains(f.name))
        // Integral `div`, not `/`: float division of an epoch-ns long
        // (~1.7e18 > 2^53) would lose µs precision through the double.
        d.withColumn(f.name, timestamp_micros(expr(s"`${f.name}` div 1000")))
      else if (f.dataType == TimestampNTZType && nanosColumns.contains(f.name))
        d.withColumn(f.name, col(f.name).cast("timestamp"))
      else d
    }
  }
}
