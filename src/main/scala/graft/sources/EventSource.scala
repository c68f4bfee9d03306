package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** The ONE loader for the `events` fixture. Every events/temporal/streaming
  * consumer goes through here so the `ts` normalization invariant lives in
  * exactly one place: downstream code may assume `ts` is a session-timezone
  * TIMESTAMP (the session tz is pinned UTC by every entry point), on which
  * `cast("long")` / `unix_micros` / `window()` are all legal.
  *
  * Fixture writers have historically produced three encodings of `ts`, and
  * all three must keep working (EventSourceSchemaSpec pins this):
  *
  *  - parquet TIMESTAMP(NANOS): Spark's vectorized reader rejects it
  *    outright, so we read raw nanos via `nanosAsLong` and rebuild a
  *    micros timestamp. The fixtures carry no sub-microsecond components
  *    (verified: epoch_ns % 1000 == 0 for every row), so `div 1000` is
  *    lossless.
  *  - TIMESTAMP_NTZ (parquet isAdjustedToUTC=false, what pyarrow emits
  *    for tz-naive `timestamp[us]`): Spark 4 forbids `cast("long")` /
  *    `unix_micros` on NTZ, so normalize to TIMESTAMP here. With the
  *    session tz pinned UTC the wall-clock reading IS the instant — the
  *    cast is value-preserving, not a guess.
  *  - TIMESTAMP (isAdjustedToUTC=true): pass through.
  */
object EventSource {

  def load(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = Tables.parquet(s, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
}
