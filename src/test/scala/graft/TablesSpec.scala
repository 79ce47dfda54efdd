package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Read-edge normalization in [[Tables]]: `events.ts` must land on the
  * epoch-NANOS long contract identically in EVERY session timezone —
  * the Verify/test sessions pin UTC but Bench (or a user session) may
  * not, and a tz-dependent conversion would silently time-shift every
  * event-time operator there. */
class TablesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("events NTZ→epoch-nanos is session-timezone independent") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-tables-ntz").toString
    // write an events table whose ts is TIMESTAMP_NTZ on disk (parquet
    // micros without tz — the shape the driver's generator emits)
    Seq(1L).toDF("event_id")
      .withColumn("ts",
        expr("TIMESTAMP_NTZ '2020-01-01 12:34:56.789'"))
      .write.parquet(s"$dir/events.parquet")
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
      === org.apache.spark.sql.types.TimestampNTZType)

    // the NTZ wall clock interpreted AS UTC (DuckDB's epoch() contract)
    val expectedNanos = java.time.LocalDateTime
      .of(2020, 1, 1, 12, 34, 56, 789000000)
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000000L

    def readTs(): Long =
      Tables.events(spark, dir).select("ts").head.getLong(0)

    val tzBefore = spark.conf.get("spark.sql.session.timeZone")
    try {
      assert(readTs() === expectedNanos) // UTC session
      spark.conf.set("spark.sql.session.timeZone", "Australia/Sydney")
      assert(readTs() === expectedNanos,
        "NTZ conversion must not consult the session timezone")
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      assert(readTs() === expectedNanos)
    } finally {
      spark.conf.set("spark.sql.session.timeZone", tzBefore)
      Tables.evict(spark)
    }
  }
}
