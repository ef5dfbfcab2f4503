package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Fixture-table loader.
  *
  * The `events` fixture stores `ts` as a parquet TIMESTAMP(NANOS) column,
  * which Spark's schema converter rejects by default. We read nanos as a
  * long (`spark.sql.legacy.parquet.nanosAsLong` — a runtime SQL conf) and
  * rebuild the column as a micro-precision timestamp, which is what every
  * other engine (and the DuckDB oracle) sees after nano→micro truncation.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      // integer division: ts is ~1.7e18 ns, beyond double's 2^53 exact range,
      // so `/ 1000` (double division) would be off by ±1 µs
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
