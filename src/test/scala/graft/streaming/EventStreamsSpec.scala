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
    // both twins emit timestamp_ntz (collects as java.time.LocalDateTime);
    // a getTimestamp read here would mask a type regression on either side
    val streamed = spark.table("hourly").collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0), r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet
    val batch = Events.hourlyCounts(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0), r.getString(1),
        r.getLong(2), r.getDouble(4))).toSet
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("parquet sink + checkpoint: a restart resumes offsets and writes each row exactly once") {
    import org.apache.spark.sql.functions._
    val in = Files.createTempDirectory("ev_ck_in").toString
    val out = Files.createTempDirectory("ev_ck_out").toString
    val ck = Files.createTempDirectory("ev_ck_meta").toString
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    def proj(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("event_type") =!= "click")
        .select(col("event_id"), col("user_id"), col("event_type"),
          Events.tsSeconds(df).as("sec"))
    // run 1: only the even half of the input exists
    raw.filter(col("event_id") % 2 === 0).write.mode("append").parquet(in)
    EventStreams.runToParquet(
      proj(EventStreams.readEventStream(spark, in)
        .drop("ts_utc", "ts_sec")), out, ck)
    val afterFirst = spark.read.parquet(out).count()
    assert(afterFirst > 0)
    // new files land; a NEW query instance restarts from the checkpoint
    raw.filter(col("event_id") % 2 === 1).write.mode("append").parquet(in)
    EventStreams.runToParquet(
      proj(EventStreams.readEventStream(spark, in)
        .drop("ts_utc", "ts_sec")), out, ck)
    val result = spark.read.parquet(out)
    // exactly once: nothing from run 1 was reprocessed...
    val dupes = result.groupBy("event_id").count().filter(col("count") > 1).count()
    assert(dupes == 0, s"$dupes event_ids written more than once")
    // ...and nothing was lost: the sink equals the batch projection
    val got = result.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    val expected = proj(raw).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    assert(got == expected && expected.size > afterFirst)
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

  test("stream-stream interval join matches the batch join on the same data") {
    import org.apache.spark.sql.functions._
    def sides(df: org.apache.spark.sql.DataFrame) = (
      df.filter(col("event_type") === "purchase"),
      df.filter(col("event_type") === "view"))
    val stream = EventStreams.readEventStream(spark, streamDir)
    val (sp, sv) = sides(stream)
    EventStreams.runToMemory(EventStreams.purchaseViewJoins(sp, sv),
      "pv_joins", OutputMode.Append())
    val streamed = spark.table("pv_joins").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // batch twin: identical predicate over the same files read as batch
    val batch = Events.withTimeColumns(spark.read.parquet(streamDir))
    val (bp, bv) = sides(batch)
    val expected = bp.alias("p").join(bv.alias("v"),
        expr("""p.user_id = v.user_id AND
                v.ts_utc >= p.ts_utc - INTERVAL 30 MINUTES AND
                v.ts_utc <= p.ts_utc"""))
      .select(col("p.event_id"), col("v.event_id"), col("p.user_id"),
        (col("p.ts_sec") - col("v.ts_sec")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(expected.nonEmpty && streamed == expected)
  }

  test("foreachBatch maintained spend equals the batch aggregate; one version per batch") {
    import java.nio.file.attribute.FileTime
    import org.apache.spark.sql.functions._
    val src = "/root/testdata/sf0.001"
    val all = Events.events(spark, src)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val in = Files.createTempDirectory("ev_maint_in")
    (0 until 3).foreach { i =>
      val tmp = Files.createTempDirectory(s"ev_maint_tmp$i").toString
      all.filter(col("event_id") % 3 === i)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = in.resolve(s"part$i.parquet")
      Files.copy(part.toPath, dst)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(1000000L * (i + 1)))
    }
    val stream = spark.readStream
      .schema(EventStreams.eventSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(in.toString)
    val stateDir = Files.createTempDirectory("ev_maint_state").toString
    val ckpt = Files.createTempDirectory("ev_maint_ckpt").toString
    EventStreams.maintainUserSpend(stream, stateDir, ckpt)
    // one merged version per micro-batch — the merge genuinely iterated
    val versions = new java.io.File(stateDir).listFiles()
      .map(_.getName).filter(_.startsWith("v_"))
    assert(versions.length == 3, versions.mkString(","))
    val got = spark.read
      .parquet(EventStreams.latestStatePath(spark, stateDir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // maintain(agg, agg-delta) == agg(all): the q79 law, live — on the
    // same decimal cents route the batch q79 uses
    val expected = all
      .select(col("user_id"),
        (graft.ops.dec2(col("value")) * 100).cast("long").as("cents"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("cents").as("sum_cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.nonEmpty && got == expected)
  }

  test("flatMapGroupsWithState emits each session once: gap-closed and timeout-closed") {
    import java.nio.file.attribute.FileTime
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val in = Files.createTempDirectory("ev_sessions_in")
    def writeFile(name: String, rows: Seq[(Long, Long, Long)],
        mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("ev_sess_tmp").toString
      rows.toDF("event_id", "user_id", "sec")
        .select(col("event_id"), col("user_id"),
          lit("view").as("event_type"), (col("sec") * 1000000000L).as("ts"),
          lit(1.0).as("value"))
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = in.resolve(name)
      Files.copy(part.toPath, dst)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(mtime))
    }
    // batch 1: user 1 has two events 500s apart (one session); user 2 one
    // event. batch 2: user 1 returns after a >30 min gap (closes session
    // 1 by GAP). batch 3: an unrelated user far in the future advances
    // the watermark past user 2's deadline (closes session by TIMEOUT).
    writeFile("a.parquet", Seq((1L, 1L, 1000L), (2L, 1L, 1500L),
      (3L, 2L, 1200L)), 1000000L)
    writeFile("b.parquet", Seq((4L, 1L, 10000L)), 2000000L)
    writeFile("c.parquet", Seq((5L, 9L, 50000L)), 3000000L)
    val stream = spark.readStream
      .schema(EventStreams.eventSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(in.toString)
      .withColumn("ts_utc", expr("timestamp_micros(ts div 1000)"))
      .withColumn("ts_sec", expr("ts div 1000000000"))
    EventStreams.runToMemory(
      EventStreams.closedSessions(spark, stream).toDF(),
      "closed_sessions", OutputMode.Append())
    val got = spark.table("closed_sessions").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // user 1's first session: closed by the gap when event 4 arrived
    assert(got.contains((1L, 1000L, 1500L, 2L)),
      s"gap-closed session missing from $got")
    // user 2's session: closed by the event-time TIMEOUT (no later
    // event for user 2 ever arrived — only the watermark moved)
    assert(got.contains((2L, 1200L, 1200L, 1L)),
      s"timeout-closed session missing from $got")
    // nothing is emitted twice
    assert(got.size == spark.table("closed_sessions").count())
  }

  test("an in-watermark straggler widens the open session instead of corrupting it") {
    import java.nio.file.attribute.FileTime
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val in = Files.createTempDirectory("ev_ooo_in")
    def writeFile(name: String, rows: Seq[(Long, Long, Long)],
        mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("ev_ooo_tmp").toString
      rows.toDF("event_id", "user_id", "sec")
        .select(col("event_id"), col("user_id"),
          lit("view").as("event_type"), (col("sec") * 1000000000L).as("ts"),
          lit(1.0).as("value"))
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = in.resolve(name)
      Files.copy(part.toPath, dst)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(mtime))
    }
    // batch 2 delivers an event EARLIER than batch 1's (in-watermark:
    // 9000 >= 10000-1800). A naive lastSec assignment would leave state
    // (start=10000, last=9000) and batch 3's event at 11000 would
    // measure its gap from 9000 and spuriously split the session.
    writeFile("a.parquet", Seq((1L, 1L, 10000L)), 1000000L)
    writeFile("b.parquet", Seq((2L, 1L, 9000L)), 2000000L)
    writeFile("c.parquet", Seq((3L, 1L, 11000L)), 3000000L)
    writeFile("d.parquet", Seq((4L, 9L, 50000L)), 4000000L) // advance wm
    val stream = spark.readStream
      .schema(EventStreams.eventSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(in.toString)
      .withColumn("ts_utc", expr("timestamp_micros(ts div 1000)"))
      .withColumn("ts_sec", expr("ts div 1000000000"))
    EventStreams.runToMemory(
      EventStreams.closedSessions(spark, stream).toDF(),
      "ooo_sessions", OutputMode.Append())
    val user1 = spark.table("ooo_sessions").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .filter(_._1 == 1L).toSet
    // ONE session spanning all three events, start widened to 9000
    assert(user1 == Set((1L, 9000L, 11000L, 3L)), s"got $user1")
  }

  test("q104 twin: streamed session sequences reproduce the batch behavior vocabulary") {
    import org.apache.spark.sql.functions._
    val src = "/root/testdata/sf0.001"
    val raw = spark.read.parquet(s"$src/events.parquet")
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    // sentinel: one far-future event from a user outside the corpus —
    // its event time pushes the final watermark past every real
    // session's timeout deadline, so every tail session closes and the
    // stream's emitted session multiset is the batch session set
    // EXACTLY (the sentinel's own session never closes and is filtered)
    val sentinel = raw.orderBy("event_id").limit(1)
      .withColumn("user_id", lit(-999L))
      .withColumn("ts", expr("ts + INTERVAL 100 DAYS"))
    val in = Files.createTempDirectory("seq_twin_in").toString
    raw.select(cols.map(col): _*)
      .unionByName(sentinel.select(cols.map(col): _*))
      .coalesce(1).write.mode("overwrite").parquet(s"$in/events.parquet")
    val stream = EventStreams.readEventStream(spark, s"$in/events.parquet")
    EventStreams.runToMemory(
      EventStreams.closedSessionSequences(spark, stream).toDF(),
      "seq_twin", OutputMode.Append())
    val emitted = spark.table("seq_twin").collect()
      .map(r => (r.getLong(0), r.getString(2)))
      .filter(_._1 != -999L).map(_._2).toSeq
    assert(emitted.nonEmpty)
    // replay the batch vocabulary cut (count per sequence, n desc then
    // sequence asc, top k, rank) over the emitted closed sessions
    val k = 20
    val gotTop = emitted.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy { case (s, n) => (-n, s) }.take(k).zipWithIndex
      .map { case ((s, n), i) => ((i + 1).toLong, s, n) }.toSeq
    val batch = Events.sessionSequences(spark, src, k).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(gotTop == batch)
  }

  test("closed sessions on the real corpus == driver-side sessionization minus open tails") {
    import org.apache.spark.sql.functions._
    val stream = EventStreams.readEventStream(spark, streamDir)
    EventStreams.runToMemory(
      EventStreams.closedSessions(spark, stream).toDF(),
      "closed_real", OutputMode.Append())
    val got = spark.table("closed_real").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // independent driver-side sessionizer over the same events. The
    // stream must emit (a) every gap-closed session, plus (b) tail
    // sessions whose timeout deadline fell behind the final watermark —
    // Spark runs a no-data batch after the watermark advances, firing
    // eviction timeouts. (a) is exact; (b) is bracketed generously
    // (<=) so a millisecond boundary tie can't flap the test.
    val rawEvs = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val evs = rawEvs
      .select(col("user_id"), Events.tsSeconds(rawEvs).as("sec")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val wmSec = evs.map(_._2).max - 1800 // 30-minute watermark delay
    val perUser = evs.groupBy(_._1).map { case (user, rows) =>
      val secs = rows.map(_._2).sorted
      val sessions = secs.tail.foldLeft(
        List((secs.head, secs.head, 1L))) { case (acc, s) =>
        val (st, last, n) = acc.head
        if (s - last <= 1800) (st, s, n + 1) :: acc.tail
        else (s, s, 1L) :: acc
      }.reverse
      user -> sessions
    }
    val gapClosed = perUser.flatMap { case (u, ss) =>
      ss.dropRight(1).map { case (st, last, n) => (u, st, last, n) } }.toSet
    val eligibleTails = perUser.flatMap { case (u, ss) =>
      ss.takeRight(1).collect {
        case (st, last, n) if last + 1800 <= wmSec => (u, st, last, n) } }.toSet
    assert(gapClosed.subsetOf(got),
      s"gap-closed sessions missing: ${(gapClosed -- got).take(3)}")
    assert(got.subsetOf(gapClosed ++ eligibleTails),
      s"unexpected emissions: ${(got -- gapClosed -- eligibleTails).take(3)}")
    // emit-once: no session appears twice
    assert(got.size == spark.table("closed_real").count())
  }

  test("streaming dedup suppresses re-delivered events and keeps every unique one") {
    import org.apache.spark.sql.functions._
    // an at-least-once source: the same parquet file lands twice, plus a
    // second copy of the odd half — every event arrives 2 or 3 times
    val in = Files.createTempDirectory("ev_dedup_in").toString
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    raw.write.mode("append").parquet(in)
    raw.write.mode("append").parquet(in)
    raw.filter(col("event_id") % 2 === 1).write.mode("append").parquet(in)
    val deduped = EventStreams.dedupedEvents(
        EventStreams.readEventStream(spark, in))
      .select("event_id", "user_id", "event_type")
    EventStreams.runToMemory(deduped, "deduped", OutputMode.Append())
    val got = spark.table("deduped").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // exactly one row per unique event, none invented, none lost
    assert(got.length == got.map(_._1).distinct.length,
      "a re-delivered event_id survived dedup")
    val expected = raw.select("event_id", "user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got.toSet == expected)
  }

  test("q110 twin: streamed HLL registers equal the batch sketch cell for cell") {
    val m = 8 // small register count forces real max-collisions in-cell
    val stream = EventStreams.readEventStream(spark, streamDir)
    EventStreams.runToMemory(EventStreams.hllRegisterStream(stream, m),
      "hll_regs", OutputMode.Complete())
    val streamed = spark.table("hll_regs").collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getInt(2))).toMap
    // max associativity/idempotence is what makes micro-batch folding
    // equivalent to the one-shot batch aggregate
    val batch = Events.hllRegistersOf(
        Events.events(spark, "/root/testdata/sf0.001"), m).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getInt(2))).toMap
    assert(streamed.nonEmpty && streamed == batch)
    // the fixed-state bound the twin exists for: m registers per type
    val nTypes = streamed.keySet.map(_._1).size
    assert(streamed.size <= m * nTypes)
  }

  test("q124 twin: streamed burst flags equal batch under the frozen median model") {
    val src = "/root/testdata/sf0.001"
    // freeze the model from the SAME corpus the stream replays, so the
    // in-flight verdicts must reproduce batch q124 row for row
    val medians = EventStreams.fitBurstMedians(spark, src)
    assert(medians.nonEmpty)
    val stream = EventStreams.readEventStream(spark, streamDir)
    EventStreams.runToMemory(
      EventStreams.burstFlaggedDays(stream, medians),
      "burst_days", OutputMode.Complete())
    val streamed = spark.table("burst_days").collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    val batch = Events.volumeBursts(spark, src).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(streamed.nonEmpty && streamed == batch)
    // state bound: one row per (type, day), never per event
    assert(streamed.size == batch.size)
    graft.ops.CachedStages.release(spark)
  }
  test("q145 twin: streamed winsorized sums reproduce the batch winsorized mean") {
    val src = "/root/testdata/sf0.001"
    val bounds = EventStreams.fitTrimBounds(spark, src)
    assert(bounds.nonEmpty)
    val stream = EventStreams.readEventStream(spark, streamDir)
    EventStreams.runToMemory(
      EventStreams.winsorizedValueStream(stream, bounds),
      "winsor_vals", OutputMode.Complete())
    val streamed = spark.table("winsor_vals").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val batch = Events.trimmedStats(spark, src).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(7)))).toMap
    assert(streamed.keySet == batch.keySet)
    // the clamped running sum re-derives batch q145's winsorized mean
    // exactly: pointwise clamping == rank-interval winsorization
    streamed.foreach { case (t, (n, wsum)) =>
      assert(n == batch(t)._1)
      assert((BigInt(wsum) * 10000 / n).toLong == batch(t)._2,
        s"$t: ${(BigInt(wsum) * 10000 / n).toLong} != ${batch(t)._2}")
    }
    // state is |types|-row, never per event
    assert(streamed.size == batch.size)
    graft.ops.CachedStages.release(spark)
  }
  test("q156 twin: streamed day matrix feeds the identical gate derivation") {
    val stream = EventStreams.readEventStream(spark, streamDir)
    EventStreams.runToMemory(EventStreams.dailyCountStream(stream),
      "daily_counts", OutputMode.Complete())
    val streamedDaily = spark.table("daily_counts").localCheckpoint()
    val src = "/root/testdata/sf0.001"
    val got = Events.gateFromDaily(streamedDaily, 7, 4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))).toSeq
    val batch = Events.completenessGate(spark, src).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))).toSeq
    assert(got == batch && got.nonEmpty)
    // state bound: one row per (type, day)
    assert(streamedDaily.count() == got.length.toLong)
    graft.ops.CachedStages.release(spark)
  }
  test("q172/q173 twin: ONE streamed revenue matrix feeds both reports") {
    val stream = EventStreams.readEventStream(spark, streamDir)
    EventStreams.runToMemory(EventStreams.dailyRevenueStream(stream),
      "daily_revenue", OutputMode.Complete())
    val streamedDaily = spark.table("daily_revenue").localCheckpoint()
    val src = "/root/testdata/sf0.001"
    // cell-for-cell: maintained state == the batch collapse
    val batchDaily = Events.events(spark, src)
      .groupBy(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.expr("ts_sec div 86400").as("day"))
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.expr(
          "CAST(CAST(value AS DECIMAL(12, 2)) * 100 AS BIGINT)"))
        .as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val streamedMap = streamedDaily.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamedMap == batchDaily && streamedMap.nonEmpty)
    // both derived reports equal their batch operators row for row
    def rows6(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (0 until r.length).map(i => r.get(i)).toSeq).toSeq
    val trendStreamed = rows6(Events.theilSenTrendOfDaily(streamedDaily))
    graft.ops.CachedStages.release(spark)
    val trendBatch = rows6(Events.theilSenTrend(spark, src))
    graft.ops.CachedStages.release(spark)
    assert(trendStreamed == trendBatch && trendBatch.nonEmpty)
    val btStreamed = rows6(Events.forecastBacktestOfDaily(streamedDaily))
    graft.ops.CachedStages.release(spark)
    val btBatch = rows6(Events.forecastBacktest(spark, src))
    graft.ops.CachedStages.release(spark)
    assert(btStreamed == btBatch && btBatch.nonEmpty)
    // the SPC/seasonality consumers of the SAME maintained matrix:
    // Shewhart chart (q180), weekday profile (q182), CUSUM (q187)
    val ccStreamed = rows6(Events.controlChartOfDaily(streamedDaily))
    graft.ops.CachedStages.release(spark)
    val ccBatch = rows6(Events.controlChart(spark, src))
    graft.ops.CachedStages.release(spark)
    assert(ccStreamed == ccBatch && ccBatch.nonEmpty)
    val wpStreamed = rows6(Events.weekdayProfileOfDaily(streamedDaily))
    graft.ops.CachedStages.release(spark)
    val wpBatch = rows6(Events.weekdayProfile(spark, src))
    graft.ops.CachedStages.release(spark)
    assert(wpStreamed == wpBatch && wpBatch.nonEmpty)
    val cuStreamed = rows6(Events.cusumChartOfDaily(streamedDaily))
    graft.ops.CachedStages.release(spark)
    val cuBatch = rows6(Events.cusumChart(spark, src))
    graft.ops.CachedStages.release(spark)
    assert(cuStreamed == cuBatch && cuBatch.nonEmpty)
    val ewStreamed = rows6(Events.ewmaChartOfDaily(streamedDaily))
    graft.ops.CachedStages.release(spark)
    val ewBatch = rows6(Events.ewmaChart(spark, src))
    graft.ops.CachedStages.release(spark)
    assert(ewStreamed == ewBatch && ewBatch.nonEmpty)
    val acStreamed = rows6(Events.acfOfDaily(streamedDaily))
    graft.ops.CachedStages.release(spark)
    val acBatch = rows6(Events.acfDaily(spark, src))
    graft.ops.CachedStages.release(spark)
    assert(acStreamed == acBatch && acBatch.nonEmpty)
    val haStreamed = rows6(Events.hampelOfDaily(streamedDaily))
    graft.ops.CachedStages.release(spark)
    val haBatch = rows6(Events.hampelOutliers(spark, src))
    graft.ops.CachedStages.release(spark)
    assert(haStreamed == haBatch && haBatch.nonEmpty)
    // q254's lead-lag matrix is one more consumer of the SAME state
    val lsStreamed = rows6(
      graft.ops.RankTests.laggedSpearmanOf(streamedDaily, 3))
    graft.ops.CachedStages.release(spark)
    val lsBatch = rows6(graft.ops.RankTests.laggedSpearman(spark, src, 3))
    graft.ops.CachedStages.release(spark)
    assert(lsStreamed == lsBatch && lsBatch.nonEmpty)
  }
  test("q230/q231/q232/q234 twins: maintained day matrices feed the " +
    "tau/changepoint/runs/Holt reports identically") {
    val stream = EventStreams.readEventStream(spark, streamDir)
    EventStreams.runToMemory(EventStreams.dailyRevenueStream(stream),
      "daily_rev_r13", OutputMode.Complete())
    val streamedRev = spark.table("daily_rev_r13").localCheckpoint()
    val stream2 = EventStreams.readEventStream(spark, streamDir)
    EventStreams.runToMemory(
      EventStreams.dailyVolumeRevenueStream(stream2),
      "daily_volrev_r13", OutputMode.Complete())
    val streamedVR = spark.table("daily_volrev_r13").localCheckpoint()
    val src = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (0 until r.length).map(i => r.get(i)).toSeq).toSeq
    val asX = streamedRev.withColumnRenamed("cents", "x")
    val peS = rows(graft.ops.RankTests.pettittOfDaily(asX))
    graft.ops.CachedStages.release(spark)
    val peB = rows(graft.ops.RankTests.pettitt(spark, src))
    graft.ops.CachedStages.release(spark)
    assert(peS == peB && peB.nonEmpty)
    val ruS = rows(graft.ops.RankTests.runsTestOfDaily(asX))
    graft.ops.CachedStages.release(spark)
    val ruB = rows(graft.ops.RankTests.runsTest(spark, src))
    graft.ops.CachedStages.release(spark)
    assert(ruS == ruB && ruB.nonEmpty)
    val hoS = rows(Events.holtChartOfDaily(streamedRev))
    graft.ops.CachedStages.release(spark)
    val hoB = rows(Events.holtChart(spark, src))
    graft.ops.CachedStages.release(spark)
    assert(hoS == hoB && hoB.nonEmpty)
    val ktS = rows(graft.ops.RankTests.kendallTauOfDaily(streamedVR))
    graft.ops.CachedStages.release(spark)
    val ktB = rows(graft.ops.RankTests.kendallTau(spark, src))
    graft.ops.CachedStages.release(spark)
    assert(ktS == ktB && ktB.nonEmpty)
  }
}
