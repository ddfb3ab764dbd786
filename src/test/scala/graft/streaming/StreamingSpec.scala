package graft.streaming

import graft.streaming.EventStreams.Event
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Structured Streaming tests: the tumbling-window aggregation and the
 * keyed-state sessionizer run on a MemoryStream and must agree with their
 * batch mirrors (st01/st02 shapes in graft.queries.Queries).
 */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("streaming-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(minute: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private val fixture = Seq(
    Event(0, ts(5), 1, "click", 1.0),
    Event(1, ts(20), 1, "click", 2.0),
    Event(2, ts(65), 2, "view", 3.0),   // second hour window
    Event(3, ts(70), 1, "click", 4.0),
    Event(4, ts(130), 1, "view", 5.0))  // third hour; 60-min gap for user 1

  test("streaming tumbling window agrees with the batch window aggregation") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[Event]
    stream.addData(fixture: _*)
    val q = EventStreams.tumblingCounts(stream.toDF())
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("tumbling")
      .select(date_format(col("win_start"), "HH:mm").as("w"), col("event_type"),
        col("cnt"), col("sum_value_r"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val batch = EventStreams.tumblingCounts(fixture.toDF())
      .select(date_format(col("win_start"), "HH:mm").as("w"), col("event_type"),
        col("cnt"), col("sum_value_r"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed === batch)
    assert(streamed === Set(
      ("00:00", "click", 2L, 3.0),
      ("01:00", "view", 1L, 3.0),
      ("01:00", "click", 1L, 4.0),
      ("02:00", "view", 1L, 5.0)))
  }

  test("streaming dedup drops re-delivered event ids within the watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(fixture ++ Seq(fixture(1), fixture(3)): _*) // re-deliveries
    val q = EventStreams.dedupEvents(stream.toDF())
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val ids = spark.table("dedup").select("event_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === fixture.map(_.event_id).sorted)
  }

  test("flatMapGroupsWithState sessionizer closes sessions on gap > 30 min") {
    val s = spark
    import s.implicits._
    // bounded run: sessions still open at end-of-input are not emitted —
    // assert on the *closed* ones, which is the streaming contract.
    val closed = EventStreams.sessionize(fixture.toDS(), gapMs = 30L * 60 * 1000)
      .collect().map(o => (o.user_id, o.n_events)).toSet
    // user 1: [5,20] then [70] closed by the 130 event; [130] stays open.
    // user 2: [65] stays open.
    assert(closed === Set((1L, 2L), (1L, 1L)))
  }
}
