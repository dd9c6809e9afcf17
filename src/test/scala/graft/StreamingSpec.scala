package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.ops.Relational
import graft.streaming.Events

class StreamingSpec extends SparkSpec {

  test("readStream hourly aggregate equals the batch aggregate (memory sink)") {
    val tmp = Files.createTempDirectory("graft-stream").toString
    Files.copy(
      Paths.get(s"$sf/events.parquet"),
      Paths.get(s"$tmp/events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val q = Events.hourlyStream(spark, tmp)
      .writeStream.format("memory").queryName("hourly_test").outputMode("complete").start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("hourly_test")
      .select(date_format(col("hour_start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n_events"), col("sum_value"))
      .collect().map(_.toSeq).toSet
    val batch = Events.hourlyAgg(Tables.events(spark, sf))
      .select("hour_start", "event_type", "n_events", "sum_value")
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("watermark bounds state: aggregate streams incrementally across two batches") {
    // two micro-batches (two files): the aggregate must still equal the
    // batch result over the union — watermarked windowed agg stitches
    // in-window late rows from batch 2 into batch 1's hours
    val tmp = Files.createTempDirectory("graft-stream2").toString
    val events = Tables.events(spark, sf).orderBy("ts")
    val n = events.count()
    val half = (n / 2).toInt
    import org.apache.spark.sql.SaveMode
    // batch 1 = later half, batch 2 = earlier half (arrives "late" but
    // events span 30 days, far beyond the 2h watermark: the stream
    // result over both files must still match batch exactly in
    // complete mode, which never drops state)
    val raw = spark.read.parquet(s"$sf/events.parquet")
    raw.limit(half).write.mode(SaveMode.Overwrite).parquet(tmp)
    val q = Events.hourlyStream(spark, tmp)
      .writeStream.format("memory").queryName("hourly_inc").outputMode("complete").start()
    try {
      q.processAllAvailable()
      // batch 2 = everything not already on disk — re-evaluating
      // raw.limit(half) here could pick a different (unordered) subset
      raw.exceptAll(spark.read.parquet(tmp).select(raw.columns.map(col): _*))
        .write.mode(SaveMode.Append).parquet(tmp)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("hourly_inc")
      .select(date_format(col("hour_start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n_events"), col("sum_value"))
      .collect().map(_.toSeq).toSet
    val batch = Events.hourlyAgg(Tables.events(spark, sf))
      .select("hour_start", "event_type", "n_events", "sum_value")
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
  }

  test("stateful flatMapGroupsWithState sessionization equals the window-based one") {
    val events = Tables.events(spark, sf)
    val stateful = Events.sessionizeStatefulRollup(events)
      .select("user_id", "session_seq", "n_events", "duration_ms")
      .collect().map(_.toSeq).toSet
    val windowed = Relational.sessionize(events)
      .select("user_id", "session_seq", "n_events", "duration_ms")
      .collect().map(_.toSeq).toSet
    assert(stateful === windowed)
    assert(stateful.nonEmpty)
  }

  test("stateful sessionization survives a pathological single-user batch (100k events)") {
    import spark.implicits._
    // one power user, 100k events in one batch: runs of 10 events 1s
    // apart, then a 31-minute gap -> 10k sessions of exactly 10 events
    val gapMs = 31L * 60L * 1000L
    val evs = (0 until 100000).map { i =>
      val session = i / 10
      val offset = i % 10
      Events.Ev(1L, i.toLong, session * gapMs + offset * 1000L, "click")
    }.toDS()
    val out = Events.sessionizeStateful(evs)
      .groupBy("session_seq").count()
    assert(out.count() === 10000L)
    assert(out.filter(col("count") =!= 10L).count() === 0L)
  }
}
