package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table — the streaming
  * formulation of graft.ops.Events. The reference is daily batch only
  * (SURVEY.md §2.9: `dags/spotify_etl_dag.py:330`, no watermarks/state),
  * so this module is north-star surface: the same logical aggregations,
  * expressed as an unbounded incremental query.
  *
  * At scale the batch and streaming variants share partitioning: both
  * shuffle once on the grouping key (window/event_type, user_id), and the
  * watermark bounds state exactly like AQE bounds a batch shuffle.
  */
object EventStreams {

  /** Parquet file-source schema with `ts` in the LEGACY raw-nanos (long)
    * shape — kept for fixtures that author long-nanos events themselves.
    * Real directories should go through [[readEventStream]], which peeks
    * the batch footer and picks the right `ts` type (see
    * graft.ops.Events.withTimeColumns for the two physical shapes).
    */
  val eventSchema: StructType = eventSchemaFor(LongType)

  /** The events file-source schema with the given physical `ts` type. */
  def eventSchemaFor(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  final case class Ev(user_id: Long, ts_sec: Long)
  final case class EvT(user_id: Long, ts_sec: Long,
      ts_utc: java.sql.Timestamp)
  final case class SessionState(lastSec: Long, nSessions: Int, nEvents: Long)
  final case class UserSessions(user_id: Long, n_events: Long, n_sessions: Long)

  /** Open the events directory as a stream, with the same canonical
    * derived time columns as the batch reader. A streaming source needs
    * an explicit schema, so the physical `ts` type is peeked from the
    * directory's parquet footers with one driver-side batch read — a
    * metadata-only operation (no data scan), done once per query build.
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    val tsType = spark.read.parquet(dir).schema("ts").dataType
    graft.ops.Events.withTimeColumns(
      spark.readStream.schema(eventSchemaFor(tsType)).parquet(dir))
  }

  /** Tumbling 1-hour counts per event type with a 2-hour watermark — the
    * streaming twin of Events.hourlyCounts. In append mode a window only
    * emits once the watermark passes its end, bounding state to ~3 open
    * windows per type. The window start is cast to `timestamp_ntz` so the
    * twins stay TYPE-identical: the batch side adopted NTZ for oracle
    * alignment (Events.hourlyCounts), and a twin that differs only in
    * timezone annotation would desynchronize every downstream consumer
    * (and the equality spec) while printing identical wall-clock values.
    */
  def hourlyCounts(stream: DataFrame): DataFrame =
    stream
      .withWatermark("ts_utc", "2 hours")
      .groupBy(window(col("ts_utc"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.ops.moneySum(col("value")).as("sum_value"))
      .select(col("window.start").cast("timestamp_ntz").as("hour"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Stateful sessionization via mapGroupsWithState: per user, count
    * sessions split by >30-minute gaps (the streaming twin of
    * Events.userSessions). State per key is two numbers — constant
    * memory per user regardless of stream length.
    */
  def sessionCounts(spark: SparkSession, stream: DataFrame): Dataset[UserSessions] = {
    import spark.implicits._
    val evs = stream.select(col("user_id"), col("ts_sec")).as[Ev]
    val counted = evs.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, UserSessions](
        GroupStateTimeout.NoTimeout) {
        case (user, it, state: GroupState[SessionState]) =>
          // Events inside one trigger arrive unordered: sort by event time
          // before folding the gap detector over them. Event counts live
          // in the state too, so updates stay cumulative across triggers.
          val sorted = it.toSeq.sortBy(_.ts_sec)
          val st0 = state.getOption.getOrElse(SessionState(Long.MinValue, 0, 0L))
          val st = sorted.foldLeft(st0) { (s, e) =>
            val isNew = s.lastSec == Long.MinValue || e.ts_sec - s.lastSec > 1800
            SessionState(e.ts_sec, s.nSessions + (if (isNew) 1 else 0),
              s.nEvents + 1)
          }
          state.update(st)
          UserSessions(user, st.nEvents, st.nSessions)
      }
    counted
  }

  final case class ClosedSession(user_id: Long, start_sec: Long,
      end_sec: Long, n_events: Long)
  final case class OpenSession(startSec: Long, lastSec: Long, nEvents: Long)

  /** Session EMISSION via flatMapGroupsWithState + event-time timeout —
    * the production-shaped sibling of [[sessionCounts]]: instead of
    * re-reporting cumulative per-user counters every trigger, each
    * session is emitted EXACTLY ONCE, as a row, the moment it closes —
    * either because a later event arrived past the 30-minute gap, or
    * because the WATERMARK passed the open session's gap horizon (the
    * timeout fires with no new data, closing the tail session a
    * counter-based formulation would hold open forever). State per user
    * is one open session (three longs) and is dropped on timeout — the
    * state-eviction contract an always-on pipeline needs; downstream
    * consumers get an append-only stream of finished sessions to join
    * or aggregate without reprocessing.
    */
  def closedSessions(spark: SparkSession, stream: DataFrame): Dataset[ClosedSession] = {
    import spark.implicits._
    // a REAL watermark delay: with EventTimeTimeout the watermark also
    // gates the late-data filter in front of this operator, so a
    // 0-second delay would silently drop any event arriving out of
    // order across micro-batches — sessions would go missing, not just
    // close early. 30 minutes matches the gap horizon: an event later
    // than that belongs to a new session anyway.
    val evs = stream
      .withWatermark("ts_utc", "30 minutes")
      .select(col("user_id"), col("ts_sec"), col("ts_utc")).as[EvT]
    evs.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, it, state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // the watermark passed the gap horizon — close and evict
            // whatever session is still open (hasTimedOut, not
            // iterator-emptiness: that is the documented contract)
            val out = state.getOption.map(s =>
              ClosedSession(user, s.startSec, s.lastSec, s.nEvents))
            state.remove()
            out.iterator
          } else {
            val sorted = it.toSeq.sortBy(_.ts_sec)
            var open = state.getOption
            val closed = Seq.newBuilder[ClosedSession]
            sorted.foreach { e =>
              open match {
                // merge with min/max, not assignment: an in-watermark
                // event from a LATER file can still be earlier than the
                // stored lastSec (cross-batch disorder — the very case
                // the watermark delay keeps alive), and blind
                // assignment would emit end < start and measure the
                // next gap from the wrong edge. A straggler predating
                // the open session entirely also merges — one open
                // session per key is the state contract; its span
                // widens to cover the straggler.
                case Some(s) if e.ts_sec - s.lastSec <= 1800 =>
                  open = Some(OpenSession(math.min(s.startSec, e.ts_sec),
                    math.max(s.lastSec, e.ts_sec), s.nEvents + 1))
                case Some(s) =>
                  closed += ClosedSession(user, s.startSec, s.lastSec, s.nEvents)
                  open = Some(OpenSession(e.ts_sec, e.ts_sec, 1))
                case None =>
                  open = Some(OpenSession(e.ts_sec, e.ts_sec, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              // fire once the WATERMARK (event time, not wall clock)
              // passes the open session's gap deadline
              state.setTimeoutTimestamp(s.lastSec * 1000L + 1800L * 1000L)
            }
            closed.result().iterator
          }
      }
  }

  final case class SeqEv(user_id: Long, ts_us: Long, event_id: Long,
      event_type: String, ts_sec: Long, ts_utc: java.sql.Timestamp)
  final case class SessionEv(tsUs: Long, eventId: Long, eventType: String)
  final case class OpenSeqSession(startSec: Long, lastSec: Long,
      evs: List[SessionEv])
  final case class SessionSequence(user_id: Long, start_sec: Long,
      seq: String, n_events: Long)

  /** Streaming twin of q104 (Events.sessionSequences): each
    * 30-minute-gap session serialized to its ordered event-type string
    * — the behavior document a next-event LM trains on — emitted
    * EXACTLY ONCE when the session closes, by gap or by watermark
    * timeout (the [[closedSessions]] eviction contract). State per user
    * is the ONE open session's event buffer, human-bounded by the gap
    * rule itself (a session ends 30 minutes after its user stops
    * acting) — the same reason the batch `collect_list` group is never
    * hot. The emitted sequence's internal order is exact: the buffer
    * re-sorts on `(ts_us, event_id)` at emission (the batch
    * `array_sort` key), so an in-watermark straggler lands in its true
    * position regardless of arrival order. Downstream, this append-only
    * stream feeds the same sequence-count/top-k cut the batch
    * vocabulary runs — EventStreamsSpec asserts the round trip equals
    * batch q104 on the fixture.
    */
  def closedSessionSequences(spark: SparkSession,
      stream: DataFrame): Dataset[SessionSequence] = {
    import spark.implicits._
    val evs = stream
      .withWatermark("ts_utc", "30 minutes")
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("event_type"), col("ts_sec"), col("ts_utc")).as[SeqEv]
    def emit(user: Long, s: OpenSeqSession): SessionSequence =
      SessionSequence(user, s.startSec,
        s.evs.sortBy(e => (e.tsUs, e.eventId)).map(_.eventType)
          .mkString(" "), s.evs.size.toLong)
    evs.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSeqSession, SessionSequence](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, it, state: GroupState[OpenSeqSession]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s => emit(user, s))
            state.remove()
            out.iterator
          } else {
            // sort by the batch ordering key, not just ts_sec: within a
            // trigger the gap fold must walk events in the exact order
            // the batch window ranks them, or a same-second tie could
            // split differently
            val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
            var open = state.getOption
            val closed = Seq.newBuilder[SessionSequence]
            sorted.foreach { e =>
              open match {
                // min/max widening for in-watermark stragglers — the
                // closedSessions discipline; the buffer re-sorts at
                // emission so the straggler still lands in order
                case Some(s) if e.ts_sec - s.lastSec <= 1800 =>
                  open = Some(OpenSeqSession(
                    math.min(s.startSec, e.ts_sec),
                    math.max(s.lastSec, e.ts_sec),
                    SessionEv(e.ts_us, e.event_id, e.event_type) :: s.evs))
                case Some(s) =>
                  closed += emit(user, s)
                  open = Some(OpenSeqSession(e.ts_sec, e.ts_sec,
                    SessionEv(e.ts_us, e.event_id, e.event_type) :: Nil))
                case None =>
                  open = Some(OpenSeqSession(e.ts_sec, e.ts_sec,
                    SessionEv(e.ts_us, e.event_id, e.event_type) :: Nil))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastSec * 1000L + 1800L * 1000L)
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming exact-dedup — the streaming member of the dedup family
    * (graft.ops.Dedup covers batch; this is the twin of its
    * content-hash groupBy shape, keyed on event_id). Suppresses
    * re-deliveries of the same event_id with
    * `dropDuplicatesWithinWatermark`: the first-seen row is forwarded
    * immediately, and the per-key suppression state is dropped once the
    * watermark passes the event's time. State is therefore bounded by
    * (dedup horizon) x (arrival rate) — NOT by stream length, which is
    * what plain `dropDuplicates` would cost on an unbounded stream.
    * This is the contract an at-least-once source (Kafka redeliveries,
    * file-source re-uploads) needs from the ingestion edge.
    */
  def dedupedEvents(stream: DataFrame, horizon: String = "2 hours"): DataFrame =
    stream
      .withWatermark("ts_utc", horizon)
      .dropDuplicatesWithinWatermark("event_id")

  /** q110's twin: the m-register HyperLogLog table maintained AT the
    * ingestion edge — `graft.ops.Events.hllRegistersOf` verbatim over
    * the stream, so each micro-batch's (event_type, idx, rho) rows fold
    * into the registers by max. Max is idempotent, commutative and
    * mergeable, which is why the streamed registers equal the batch
    * sketch cell for cell (EventStreamsSpec asserts it) and why NO
    * watermark is needed: state is FIXED at m × |event types| rows
    * forever — the key space IS the sketch geometry, the same bound the
    * CMS twin (DocStreams.cmsCounterStream) rides. A reader computes
    * the estimate from the registers at any moment without stopping
    * the stream.
    */
  def hllRegisterStream(stream: DataFrame, m: Int = 64): DataFrame =
    graft.ops.Events.hllRegistersOf(
      stream.select(col("event_type"), col("user_id")), m)

  /** Fit the frozen per-type median daily volume for
    * [[burstFlaggedDays]] — the batch q124 medians collected as a
    * |types|-entry map (model-sized; the fifth documented frozen-model
    * fitter).
    */
  def fitBurstMedians(spark: org.apache.spark.sql.SparkSession,
      dir: String): Map[String, Long] =
    graft.ops.Events.volumeBursts(spark, dir)
      .select(col("event_type"), col("median_n")).distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  /** q124's twin: LIVE volume-burst flags under the FROZEN per-type
    * median model. Arriving events aggregate to per-(type, day) counts
    * in Complete mode — state is the day-granular count matrix, which
    * grows one row per (type, day), never with event volume — and each
    * emitted day carries the same integer `n·10 ≥ median·25` verdict
    * batch q124 computes, against the medians the OFFLINE pass fitted
    * (the monitoring shape: thresholds re-fit daily/weekly offline,
    * applied in-flight). Types unseen at fit time surface with a NULL
    * median and a NULL flag — the "new event type" alarm itself.
    */
  def burstFlaggedDays(stream: DataFrame,
      medians: Map[String, Long]): DataFrame = {
    require(medians.nonEmpty, "empty median model: nothing to flag against")
    val medLit = typedlit(medians)
    stream
      .select(col("event_type"), expr("ts_sec div 86400").as("day"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"))
      .withColumn("median_n", element_at(medLit, col("event_type")))
      .withColumn("is_burst",
        (col("n") * 10 >= col("median_n") * 25).cast("long"))
  }

  /** Fit the frozen per-type winsorization clamp bounds for
    * [[winsorizedValueStream]] — batch q145's `(lo_cents, hi_cents)`
    * trim boundaries collected as a |types|-entry map (model-sized;
    * the sixth documented frozen-model fitter).
    */
  def fitTrimBounds(spark: org.apache.spark.sql.SparkSession, dir: String,
      trimPct: Int = 5): Map[String, (Long, Long)] =
    graft.ops.Events.trimmedStats(spark, dir, trimPct)
      .select(col("event_type"), col("lo_cents"), col("hi_cents"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  /** q145's twin: WINSORIZED running value statistics under the FROZEN
    * clamp bounds — the robust revenue monitor at the ingestion edge:
    * bounds re-fit offline (daily/weekly), applied in-flight, so one
    * fat-fingered refund or bot burst cannot move the running mean it
    * is judged against. Each arriving value clamps statelessly to its
    * type's `[lo, hi]` band; state is the |types|-row (n, winsorized
    * cents sum) matrix, never per event. Replaying the fit corpus must
    * reproduce batch q145's winsorized mean EXACTLY: clamping is
    * pointwise-identical to the rank-interval arithmetic because
    * values tied with a boundary clamp to themselves (EventStreamsSpec
    * asserts it). Types unseen at fit time surface with NULL sums —
    * the new-type alarm, as in the burst twin.
    */
  def winsorizedValueStream(stream: DataFrame,
      bounds: Map[String, (Long, Long)]): DataFrame = {
    require(bounds.nonEmpty, "empty bounds model: nothing to clamp to")
    val lo = typedlit(bounds.view.mapValues(_._1).toMap)
    val hi = typedlit(bounds.view.mapValues(_._2).toMap)
    stream
      .select(col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(12, 2)) * 100 AS BIGINT)")
          .as("cents"))
      .withColumn("lo", element_at(lo, col("event_type")))
      .withColumn("hi", element_at(hi, col("event_type")))
      .withColumn("wcents", expr("greatest(least(cents, hi), lo)"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("wcents")).as("winsor_sum_cents"))
  }

  /** q156's twin: the day-granular count matrix maintained at the
    * ingestion edge — the SAME state the burst twin keeps (one row per
    * (type, day), never per event; Complete mode, no watermark — day
    * counts only grow), with the completeness verdicts derived at READ
    * time by `Events.gateFromDaily` over the maintained matrix, so the
    * live "is today's partition complete yet?" dashboard and batch
    * q156 are one arithmetic. (A day's verdict naturally flips to
    * complete as its events arrive — that is the gate's semantics, not
    * a consistency bug: the batch twin sees the day's final count.)
    */
  def dailyCountStream(stream: DataFrame): DataFrame =
    stream
      .select(col("event_type"), expr("ts_sec div 86400").as("day"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"))

  /** q172/q173's twin state: the (type, day) REVENUE matrix maintained
    * at the ingestion edge — Complete-mode integer-cents sums, state
    * bounded by |types|·|days|, never per event; monotone merges need
    * no watermark. ONE streamed matrix feeds BOTH the Theil–Sen trend
    * (`Events.theilSenTrendOfDaily`) and the forecast backtest
    * (`Events.forecastBacktestOfDaily`) with arithmetic identical to
    * their batch paths — the EventStreamsSpec twin asserts row-for-row
    * equality of both derived reports.
    */
  def dailyRevenueStream(stream: DataFrame): DataFrame =
    stream
      .select(col("event_type"), expr("ts_sec div 86400").as("day"),
        expr("CAST(CAST(value AS DECIMAL(12, 2)) * 100 AS BIGINT)")
          .as("cents"))
      .groupBy("event_type", "day")
      .agg(sum(col("cents")).as("cents"))

  /** q230's twin state: the (type, day) VOLUME + REVENUE matrix —
    * the same Complete-mode bounded merge as `dailyRevenueStream`
    * carrying the event count beside the cents sum, so Kendall's tau
    * between the two daily metrics (`RankTests.kendallTauOfDaily`)
    * derives from maintained state with arithmetic identical to its
    * batch path. State stays |types|·|days|, never per event.
    */
  def dailyVolumeRevenueStream(stream: DataFrame): DataFrame =
    stream
      .select(col("event_type"), expr("ts_sec div 86400").as("day"),
        expr("CAST(CAST(value AS DECIMAL(12, 2)) * 100 AS BIGINT)")
          .as("cents"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("x"), sum(col("cents")).as("y"))

  /** Stream-stream interval join: every purchase joined to the same
    * user's views in the preceding 30 minutes. THE hard state story in
    * Structured Streaming — each side must buffer rows until the other
    * side's watermark proves no more matches can arrive, so state is
    * bounded by (watermark + interval) x arrival rate on BOTH sides; an
    * un-watermarked or un-bounded time condition would buffer the
    * streams forever. The time-range predicate is what lets Spark
    * evict: a view older than (other side's watermark - 30 min) can
    * never match a future purchase.
    */
  def purchaseViewJoins(purchases: DataFrame, views: DataFrame): DataFrame =
    purchases.withWatermark("ts_utc", "2 hours").alias("p")
      .join(views.withWatermark("ts_utc", "2 hours").alias("v"),
        expr("""p.user_id = v.user_id AND
                v.ts_utc >= p.ts_utc - INTERVAL 30 MINUTES AND
                v.ts_utc <= p.ts_utc"""))
      .select(col("p.event_id").as("purchase_id"),
        col("v.event_id").as("view_id"),
        col("p.user_id").as("user_id"),
        (col("p.ts_sec") - col("v.ts_sec")).as("gap_sec"))

  /** Convenience: run a streaming query to a named memory sink until all
    * currently-available input is processed (local smoke harness).
    */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode): Unit = {
    val q = df.writeStream.outputMode(mode).format("memory")
      .queryName(name).start()
    try q.processAllAvailable()
    finally q.stop()
  }

  /** Run a streaming query to a parquet file sink (append mode — the
    * only mode file sinks support) until all currently-available input
    * is processed, then stop. The checkpoint directory carries source
    * offsets and the sink's file manifest across restarts: invoking this
    * again with the same `checkpointDir` after new input files land
    * processes ONLY the new files — the exactly-once contract a
    * production ingestion pipeline relies on (and what EventStreamsSpec
    * asserts across a stop/restart cycle).
    */
  def runToParquet(df: DataFrame, outDir: String, checkpointDir: String): Unit = {
    val q = df.writeStream.outputMode(OutputMode.Append())
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .start()
    // stop in finally: a leaked active query would pin the checkpoint
    // dir and block the next restart with "same checkpoint location"
    try q.processAllAvailable()
    finally q.stop()
  }

  /** `foreachBatch` incremental-maintenance sink — the streaming face of
    * q79's maintained aggregate: per micro-batch, the arriving events'
    * per-user `(n_events, sum_cents)` delta-state full-outer-merges with
    * the current state table, exactly the `maintain(agg(base),
    * agg(delta)) == agg(base ∪ delta)` law the q79 oracle proves.
    *
    * Exactly-once without a transactional sink: each batch writes the
    * merged state to `stateDir/v_<batchId>` — batch ids are monotonic
    * and replay-stable, so a restart that re-delivers a batch REWRITES
    * the same version from the same pre-batch state (idempotent), never
    * double-counts. The base read picks the largest version BELOW the
    * current batch id for the same reason. (With a transactional table
    * format this collapses to one MERGE INTO; plain parquet gets the
    * versioned-overwrite recipe, which is also the time-travel debug
    * surface.) State stays one row per user — aggregation happened
    * before the merge, so version size is bounded by cardinality, not
    * by event volume.
    */
  def maintainUserSpend(stream: DataFrame, stateDir: String,
      checkpointDir: String): Unit = {
    val q = stream
      .select(col("user_id"),
        // the q79 decimal route, NOT a raw double multiply: 0.29 * 100
        // is 28.999... in IEEE double and would truncate to 28 cents
        (graft.ops.dec2(col("value")) * 100).cast("long").as("cents"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val root = new org.apache.hadoop.fs.Path(stateDir)
        val fs = root.getFileSystem(
          spark.sessionState.newHadoopConf())
        val prior =
          if (!fs.exists(root)) Array.empty[Long]
          else fs.listStatus(root).map(_.getPath.getName)
            .filter(_.startsWith("v_")).map(_.stripPrefix("v_").toLong)
            .filter(_ < batchId)
        val delta = batch.groupBy("user_id").agg(
          count(lit(1)).as("n_events"), sum("cents").as("sum_cents"))
        val merged =
          if (prior.isEmpty) delta
          else {
            val base = spark.read.parquet(s"$stateDir/v_${prior.max}")
            base.withColumnRenamed("n_events", "n_b")
              .withColumnRenamed("sum_cents", "s_b")
              .join(delta.withColumnRenamed("n_events", "n_d")
                .withColumnRenamed("sum_cents", "s_d"),
                Seq("user_id"), "full_outer")
              .select(col("user_id"),
                (coalesce(col("n_b"), lit(0L)) + coalesce(col("n_d"), lit(0L)))
                  .as("n_events"),
                (coalesce(col("s_b"), lit(0L)) + coalesce(col("s_d"), lit(0L)))
                  .as("sum_cents"))
          }
        merged.write.mode("overwrite").parquet(s"$stateDir/v_$batchId")
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()
  }

  /** Path of the newest maintained state version under `stateDir`. */
  def latestStatePath(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): String = {
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val vs = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("v_")).map(_.stripPrefix("v_").toLong)
    require(vs.nonEmpty, s"no state versions under $stateDir")
    s"$stateDir/v_${vs.max}"
  }
}
