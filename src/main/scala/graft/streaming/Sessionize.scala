package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Custom streaming state: gap-based sessionization over an event stream
  * via `flatMapGroupsWithState` — the `KeyValueGroupedDataset` typed-state
  * surface (beyond the reference, which only polls micro-batches; this is
  * the Spark-first shape its 5-minute event feed would grow into).
  *
  * A session closes when no event arrives for `gap`; closed sessions emit
  * (user, start, end, events, total_value). Event-time timeouts + the
  * watermark bound state size — per-key state is O(1) regardless of
  * stream length, so 100 TB of history never accumulates in memory.
  */
object Sessionize {

  final case class Event(user_id: Long, ts: Timestamp, value: Double)
  /** `start`/`last` are epoch MICROSECONDS — millisecond precision
    * (Timestamp.getTime) would silently truncate micro-precision event
    * times, smearing both the emitted session bounds and the gap
    * decisions relative to the batch twin. */
  final case class SessionState(start: Long, last: Long, n: Long, total: Double)
  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long, total_value: Double)

  private def epochMicros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def microsToTs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  def sessions(spark: SparkSession, events: DataFrame, gap: String = "30 minutes",
               lateness: String = "1 hour"): Dataset[Session] = {
    import spark.implicits._
    val gapMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    require(gapMs.months == 0,
      s"session gap must be a fixed-length interval, got '$gap' (month-grain intervals have no fixed millisecond length)")
    val gapMicros = gapMs.days * 86400000000L + gapMs.microseconds

    events.selectExpr("user_id", "ts", "value").as[Event]
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, evs, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // gap elapsed with no new events: close and emit the session
            val s = state.get
            state.remove()
            Iterator(Session(user, microsToTs(s.start), microsToTs(s.last), s.n, s.total))
          } else {
            val sorted = evs.toSeq.sortBy(e => epochMicros(e.ts))
            var cur = state.getOption
            // accumulator for a chain of too-late events (they are sorted,
            // so consecutive in-gap late events form ONE session like the
            // batch twin would produce, not n single-event sessions)
            var late: Option[SessionState] = None
            val closed = Seq.newBuilder[Session]
            def flushLate(): Unit = late.foreach { l =>
              closed += Session(user, microsToTs(l.start), microsToTs(l.last), l.n, l.total)
              late = None
            }
            sorted.foreach { e =>
              val t = epochMicros(e.ts)
              cur match {
                // in-order or late-but-within-gap of the session span:
                // absorb, extending the span backwards for late arrivals
                // (keeps streaming aligned with the sorted batch twin)
                case Some(s) if t >= s.start - gapMicros && t - s.last <= gapMicros =>
                  flushLate()
                  cur = Some(SessionState(math.min(s.start, t), math.max(s.last, t),
                    s.n + 1, s.total + e.value))
                // too late for the open session: chain into the late
                // accumulator (the batch twin orders these into their own
                // earlier session(s))
                case Some(s) if t < s.start - gapMicros =>
                  late match {
                    case Some(l) if t - l.last <= gapMicros =>
                      late = Some(SessionState(l.start, math.max(l.last, t), l.n + 1, l.total + e.value))
                    case _ =>
                      flushLate()
                      late = Some(SessionState(t, t, 1, e.value))
                  }
                case Some(s) => // forward gap inside the batch: close previous, start new
                  flushLate()
                  closed += Session(user, microsToTs(s.start), microsToTs(s.last), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            flushLate()
            cur.foreach { s =>
              state.update(s)
              // a late-but-admitted event can put last+gap BEHIND the
              // current watermark; Spark rejects a timeout earlier than
              // the watermark and kills the query — clamp forward. The
              // micros→ms ceiling keeps the timeout AT or AFTER the true
              // session deadline (1 ms late is harmless; early is wrong).
              state.setTimeoutTimestamp(
                math.max(Math.floorDiv(s.last + gapMicros + 999L, 1000L),
                  state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }

  /** Batch twin with identical semantics (lag/gap/cumsum windows) — for
    * backfills and for oracle-checking the streaming path. */
  def sessionsBatch(events: DataFrame, gap: String = "30 minutes"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapExpr = s"INTERVAL $gap"
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    events
      .withColumn("__prev", lag("ts", 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev").isNull || col("ts") > col("__prev") + expr(gapExpr), 1).otherwise(0))
      .withColumn("__session_id", sum("__new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("__session_id"))
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
           count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .drop("__session_id")
  }
}
