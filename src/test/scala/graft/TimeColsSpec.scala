package graft

import graft.functions.TimeCols
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TimeColsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val events = "/root/testdata/sf0.001/events.parquet"

  private def withConf[A](key: String, value: String)(body: => A): A = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("epochMicros on an NTZ read equals the LTZ read's unix_micros") {
    def micros(): Seq[(Long, Long)] = {
      val df = spark.read.parquet(events)
      df.select(col("event_id"),
        TimeCols.epochMicros(df, "ts").as("m"))
        .orderBy("event_id").limit(50)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    val ntz = withConf("spark.sql.parquet.inferTimestampNTZ.enabled", "true")(micros())
    val ltz = withConf("spark.sql.parquet.inferTimestampNTZ.enabled", "false")(micros())
    assert(ntz == ltz, "NTZ wall time must pin to UTC, matching the LTZ instants")
    // sanity: the NTZ read really was NTZ
    withConf("spark.sql.parquet.inferTimestampNTZ.enabled", "true") {
      assert(spark.read.parquet(events).schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampNTZType)
    }
  }

  test("epochMicros is session-time-zone independent for NTZ input") {
    def micros(): Seq[Long] =
      withConf("spark.sql.parquet.inferTimestampNTZ.enabled", "true") {
        val df = spark.read.parquet(events)
        df.select(TimeCols.epochMicros(df, "ts").as("m"))
          .orderBy("m").limit(20).collect().map(_.getLong(0)).toSeq
      }
    val utc = withConf("spark.sql.session.timeZone", "UTC")(micros())
    val chi = withConf("spark.sql.session.timeZone", "America/Chicago")(micros())
    assert(utc == chi, "NTZ epoch extraction must not depend on the session zone")
  }
}
