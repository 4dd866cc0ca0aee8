package graft.streaming

import graft.SparkSpec
import graft.ops.Events
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.streaming.OutputMode

/** Streaming results must agree with their batch twins on the same data:
  * the file source drives the whole sf0.001 events table through each
  * streaming query, and the memory-sink output is compared against
  * graft.ops.Events.
  */
class EventStreamsSpec extends SparkSpec {

  lazy val streamDir: String = {
    val d = Files.createTempDirectory("events_stream")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("streaming hourly counts match the batch aggregation") {
    val stream = EventStreams.readEventStream(spark, streamDir)
    EventStreams.runToMemory(EventStreams.hourlyCounts(stream),
      "hourly", OutputMode.Complete())
    val streamed = spark.table("hourly").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val batch = Events.hourlyCounts(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(4))).toSet
    assert(streamed == batch)
  }

  test("stateful streaming sessionization matches the batch window query") {
    val stream = EventStreams.readEventStream(spark, streamDir)
    EventStreams.runToMemory(
      EventStreams.sessionCounts(spark, stream).toDF(),
      "sessions", OutputMode.Update())
    val streamed = spark.table("sessions").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Events.userSessions(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }
}
