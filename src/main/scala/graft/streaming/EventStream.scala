package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Typed event row for the custom-state operators. */
final case class StreamEvent(
    ts: java.sql.Timestamp, user_id: Long, event_type: String,
    value: Double, event_id: Long)

/** Open-session accumulator held in the state store (one per user).
  * n == 0 encodes "no open session" (the Scd2Buf curVersion convention).
  */
final case class SessionAcc(startUs: Long, lastUs: Long, n: Long, sum: Double)

/** An event buffered until the watermark matures it (sessionization). */
final case class PendingEv(t: Long, event_id: Long, value: Double)

/** Sessionization state (one per user): immature events within the
  * watermark horizon plus the open-session accumulator over the
  * matured prefix.
  */
final case class SessionBuf(pending: Vector[PendingEv], open: SessionAcc)

/** Emitted closed session — same fields/semantics as q52's
  * session_window output ([start, last+gap), epoch microseconds).
  */
final case class SessionRow(
    user_id: Long, session_start_us: Long, session_end_us: Long,
    n_events: Long, sum_value: Double)

/** Anomaly-monitor state (one per event type): counts of minutes the
  * watermark has not yet closed, plus the ring of the last
  * `baselineMinutes` closed counts in event-time order.
  */
final case class AnomalyState(open: Map[Long, Long], ring: Vector[Long])

/** A purchase buffered until the watermark passes its event time. */
final case class PendingPurchase(event_id: Long, t: Long)

/** Streaming as-of join state (one per user): click timestamps still
  * able to match a future purchase, plus purchases awaiting emission.
  */
final case class AsOfBuf(clicks: Vector[Long], pend: Vector[PendingPurchase])

/** Emitted attribution row — same fields/semantics as q109's output
  * (click fields null when nothing within tolerance).
  */
final case class AsOfRow(
    user_id: Long, purchase_event_id: Long, t_purchase_us: Long,
    t_click_us: Option[Long], gap_us: Option[Long])

/** A click awaiting its earliest at-or-after purchase (forward join). */
final case class PendingClick(event_id: Long, t: Long)

/** Forward-join state (one per user): pending clicks plus the distinct
  * purchase timestamps still able to answer one.
  */
final case class AsOfFwdBuf(clicks: Vector[PendingClick], purchases: Vector[Long])

/** Emitted time-to-conversion row — q117's output contract (purchase
  * fields null when nothing within tolerance).
  */
final case class AsOfFwdRow(
    user_id: Long, click_event_id: Long, t_click_us: Long,
    t_purchase_us: Option[Long], gap_us: Option[Long])

/** Emitted anomaly row — same fields/semantics as q115's output. */
final case class AnomalyRow(
    event_type: String, minute_us: Long, n: Long, z: Double, spike: Int)

/** Typed event row for the streaming attribution operator: channel is
  * pre-derived (the batch twin derives it from the props JSON; a
  * stream job does the same in its select before this operator).
  */
final case class AttrEvent(
    ts: java.sql.Timestamp, user_id: Long, event_type: String,
    channel: String, event_id: Long)

/** Attribution state (one per user): in-horizon clicks (ts, channel)
  * and purchases awaiting maturation.
  */
final case class AttrBuf(
    clicks: Vector[(Long, String)], pend: Vector[PendingPurchase])

/** Emitted credit split — aggregating (sum touches, distinct pids,
  * sum credit_ppm) per channel reproduces q147's declared rows.
  */
final case class CreditRow(
    user_id: Long, purchase_event_id: Long, channel: String,
    touches: Long, credit_ppm: Long)

/** A state-change candidate buffered until the watermark matures it. */
final case class PendingState(t: Long, event_id: Long, state: String)

/** SCD2 state (one per user): immature events within the watermark
  * horizon, plus the committed current interval — the streaming
  * materialization of the dimension's current-state row (curVersion=0
  * encodes "no state yet").
  */
final case class Scd2Buf(
    pending: Vector[PendingState], curState: String,
    curFromUs: Long, curVersion: Int)

/** Emitted CLOSED validity interval — q142's output contract for the
  * rows whose valid_to is known ([valid_from_us, valid_to_us),
  * versions dense per user). The one OPEN interval per user lives in
  * [[Scd2Buf]] — a streaming dimension can close history incrementally
  * but by definition never closes the current state.
  */
final case class Scd2Row(
    user_id: Long, state: String, valid_from_us: Long,
    valid_to_us: Long, version: Int)

/** Drift-monitor state (one per event type): open minute buckets not
  * yet closed by the watermark. Arrivals fold straight into their
  * bucket — an in-horizon event's bucket cannot already be closed
  * (us > wm and us < bucketEnd force bucketEnd > wm), so unlike the
  * SCD2/as-of operators no pending stage is needed and state is
  * O(open minutes), never O(arrival rate × horizon).
  */
final case class DriftBuf(open: Map[Long, Long])

/** Emitted drift observation — one per (event_type, closed minute):
  * the new-batch count for that minute next to the at-rest baseline
  * count for the type (0 when the type never appeared in the base —
  * q148's clearest-drift arm). Summing n_new per type over a stream of
  * the post-hwm slice and applying q148's share/ratio arithmetic
  * reproduces the batch drift report exactly (spec-proven).
  */
final case class DriftRow(
    event_type: String, minute_us: Long, n_new: Long, n_base: Long)

/** Structured Streaming surface — the incremental twins of the batch
  * event queries in graft.queries.Events (SURVEY.md §2.11: the
  * reference has no streaming; this is the north-star extension).
  *
  * Each transform takes a streaming OR batch DataFrame with the events
  * schema (ts timestamp, user_id long, event_type string, value double,
  * event_id long) — the same plan runs in both modes, which is how the
  * batch oracle validates the streaming semantics.
  *
  * Watermarks bound state: an aggregation over event-time windows keeps
  * per-window state until watermark passes window end; at 100 TB/day
  * the state store only ever holds (windows in watermark horizon ×
  * groups), not history.
  */
object EventStream {

  /** Timestamp → epoch MICROseconds at full precision: Timestamp
    * .getTime is MILLIseconds and the sub-ms part lives in getNanos —
    * truncating to ms would merge events the batch queries' (ts_us,
    * event_id) total order splits. One definition for every stateful
    * operator so event-time semantics cannot drift between them.
    */
  private def micros(t: java.sql.Timestamp): Long =
    t.getTime / 1000L * 1000000L + t.getNanos / 1000L

  /** Tumbling 1-hour counts per event type, 1-hour watermark. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n"), col("sum_value"),
      )

  /** Per-user session aggregation via session_window (30-minute gap) —
    * the operator Structured Streaming implements with its sessionizing
    * state store; identical semantics to the q52 batch/oracle query.
    */
  def sessionAggregates(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(
        col("user_id"),
        col("w.start").as("session_start"),
        col("w.end").as("session_end"),
        col("n_events"), col("sum_value"),
      )

  /** Streaming exact dedup on event_id: state bounded by the watermark
    * horizon (late duplicates beyond it are dropped by definition).
    */
  def dedupe(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour").dropDuplicates("event_id", "ts")

  /** Stream-stream join with watermarks: attribute each view to the
    * clicks that preceded it within `windowMinutes` for the same user
    * (the ad-attribution shape). The event-time bound plus both
    * watermarks let the state store evict rows once the watermark
    * passes click_ts + window — state is O(events in the horizon), not
    * history, which is what makes a stream-stream join runnable
    * indefinitely at 100 TB/day.
    */
  def attribution(events: DataFrame, windowMinutes: Int = 30): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(
        col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"),
      )
      .withWatermark("click_ts", "1 hour")
    val views = events.filter(col("event_type") === "view")
      .select(
        col("user_id").as("view_user"), col("ts").as("view_ts"),
        col("event_id").as("view_id"),
      )
      .withWatermark("view_ts", "1 hour")
    clicks.join(
      views,
      expr(
        s"""user_id = view_user AND
            view_ts >= click_ts AND
            view_ts <= click_ts + INTERVAL $windowMinutes MINUTES"""),
    )
      .select("user_id", "click_id", "view_id", "click_ts", "view_ts")
  }

  /** Custom stateful sessionization via flatMapGroupsWithState — the
    * escape hatch for session semantics session_window can't express
    * (here it reproduces q52's gap semantics exactly, so the built-in
    * operator validates it).
    *
    * The MATURATION-BUFFER design every stateful operator in this file
    * shares: arriving events buffer until the watermark passes them
    * (beyond-watermark arrivals drop explicitly — the family
    * contract), matured events fold into the open-session accumulator
    * in (ts, event_id) order, and a session closes only when the
    * watermark passes last + gap — at which point the close is FINAL
    * (every event at-or-under the watermark has folded, and any future
    * event arrives strictly past last + gap, necessarily starting a
    * new session). Folding is provably forward-only: an event accepted
    * at arrival satisfies t > wm_arrival ≥ wm of every earlier fold ≥
    * every already-folded t — so out-of-order arrival WITHIN the
    * horizon converges to the all-at-once result (the pre-r20 eager
    * form emitted on gap-exceeding ARRIVAL and mis-merged an
    * in-horizon event older than the open session: no math.min on the
    * start, and `us - last < gap` is vacuously true for any earlier
    * event). Wake timestamps are the earliest pending maturation or
    * the open flush time — both strictly past the current watermark by
    * construction, so the re-arm can never violate Spark's
    * timeout-past-watermark requirement (the pre-r20 form re-armed a
    * stale last + gap, which THROWS once the watermark overtakes it).
    * State is O(events in the horizon + 1 accumulator) per active user.
    */
  def sessionizeWithState(
      events: Dataset[StreamEvent], gapMinutes: Int = 30): Dataset[SessionRow] = {
    val gapUs = gapMinutes * 60L * 1000000L
    implicit val bufEnc: Encoder[SessionBuf] = Encoders.product[SessionBuf]
    implicit val rowEnc: Encoder[SessionRow] = Encoders.product[SessionRow]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong

    val NoOpen = SessionAcc(0L, 0L, 0L, 0.0)

    // 2dp HALF_UP — the SAME rounding as q52's round(sum, 2), not
    // math.round: the two agree on positives but math.round is
    // half-toward-+infinity, so a negative session sum at an exact
    // midpoint (−0.125 → −0.12 vs q52's −0.13) would diverge from the
    // batch twin this operator claims to reproduce exactly.
    def close(user: Long, a: SessionAcc): SessionRow =
      SessionRow(user, a.startUs, a.lastUs + gapUs, a.n,
        BigDecimal(a.sum).setScale(2, scala.math.BigDecimal.RoundingMode.HALF_UP)
          .toDouble)

    def update(
        user: Long, rows: Iterator[StreamEvent],
        state: GroupState[SessionBuf]): Iterator[SessionRow] = {
      var st = state.getOption.getOrElse(SessionBuf(Vector.empty, NoOpen))
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      if (!state.hasTimedOut) rows.foreach { e =>
        // Full microsecond precision: Timestamp.getTime is
        // MILLIseconds; the sub-ms part lives in getNanos. Truncating
        // to ms would merge sessions q52 splits at the exact boundary.
        val us = micros(e.ts)
        if (us > wmUs) // beyond-horizon arrivals dropped explicitly
          st = st.copy(pending = st.pending :+ PendingEv(us, e.event_id, e.value))
      }
      val (matured, stay) = st.pending.partition(_.t <= wmUs)
      val out = Seq.newBuilder[SessionRow]
      var acc = st.open
      matured.sortBy(p => (p.t, p.event_id)).foreach { p =>
        if (acc.n == 0) acc = SessionAcc(p.t, p.t, 1, p.value)
        else if (p.t - acc.lastUs < gapUs)
          // p.t >= acc.lastUs always: matured events fold sorted, and
          // cross-batch folds are forward-only (see the Scaladoc).
          acc = SessionAcc(acc.startUs, p.t, acc.n + 1, acc.sum + p.value)
        else {
          out += close(user, acc)
          acc = SessionAcc(p.t, p.t, 1, p.value)
        }
      }
      // Final close: the watermark passed last + gap, so no event can
      // ever extend this session again (see the Scaladoc argument).
      if (acc.n > 0 && acc.lastUs + gapUs <= wmUs) {
        out += close(user, acc)
        acc = NoOpen
      }
      st = SessionBuf(stay, acc)
      if (st.pending.isEmpty && st.open.n == 0) state.remove()
      else {
        state.update(st)
        // Earliest pending maturation or the open flush — both
        // strictly past the current watermark here (pending t > wm by
        // the arrival guard; an open flush time at-or-under wm just
        // closed above).
        val wakes = st.pending.map(_.t) ++
          (if (st.open.n > 0) Seq(st.open.lastUs + gapUs) else Nil)
        state.setTimeoutTimestamp(wakes.min / 1000L + 1L)
      }
      out.result().iterator
    }

    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Streaming twin of q115's windowed anomaly detection: per-minute
    * event counts z-scored against the trailing [[AnomalyState.ring]]
    * of the last `baselineMinutes` CLOSED minute counts, spikes gated
    * at z > 3 — the monitoring query, running against the live stream
    * instead of the at-rest table. A minute closes when the watermark
    * passes its end; closed counts enter the ring in event-time order,
    * so the emitted rows carry exactly the batch query's semantics
    * (same exact-integer statistics, same full-baseline and
    * non-degenerate-variance emission rule, same HALF_UP rounding) —
    * the spec proves row equality against q115 on the same data.
    * State per event type is O(open minutes in the watermark horizon
    * + baselineMinutes), never history.
    */
  def anomaliesWithState(
      events: Dataset[StreamEvent], baselineMinutes: Int = 30): Dataset[AnomalyRow] = {
    val minuteUs = 60L * 1000000L
    implicit val stEnc: Encoder[AnomalyState] = Encoders.product[AnomalyState]
    implicit val rowEnc: Encoder[AnomalyRow] = Encoders.product[AnomalyRow]
    implicit val keyEnc: Encoder[String] = Encoders.STRING

    def update(
        typ: String, rows: Iterator[StreamEvent],
        state: GroupState[AnomalyState]): Iterator[AnomalyRow] = {
      var st = state.getOption.getOrElse(AnomalyState(Map.empty, Vector.empty))
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      rows.foreach { e =>
        val us = micros(e.ts)
        // Beyond-watermark arrivals dropped explicitly ([[DriftBuf]]'s
        // argument REQUIRES this guard: us > wm and us < bucketEnd
        // force bucketEnd > wm, so an in-horizon event's bucket is
        // provably still open). Without it a late event re-creates an
        // already-closed-and-emitted minute with only the late count —
        // a duplicate (type, minute) row with a wrong n, entering the
        // ring out of event-time order. Deliberately the FAMILY
        // condition (us > wm), not the weaker sufficient one (bucket
        // still open, m + minute > wm): a ≤1-minute-late event whose
        // bucket hasn't closed is droppable data under Spark's own
        // watermark semantics for stateful aggregations, and one
        // uniform contract beats per-operator carve-outs.
        if (us > wmUs) {
          val m = us - us % minuteUs
          st = st.copy(open = st.open + (m -> (st.open.getOrElse(m, 0L) + 1L)))
        }
      }
      // Close every open minute whose END the watermark has passed, in
      // event-time order (the ring is an ordered baseline, like the
      // batch query's ROWS frame over observed minutes).
      val (closable, stillOpen) = st.open.partition { case (m, _) => m + minuteUs <= wmUs }
      val out = Seq.newBuilder[AnomalyRow]
      var ring = st.ring
      closable.toSeq.sortBy(_._1).foreach { case (m, n) =>
        if (ring.length >= baselineMinutes) {
          val base = ring.takeRight(baselineMinutes)
          val k = baselineMinutes.toLong
          val s = base.sum
          val q = base.map(x => x * x).sum
          val mean = s.toDouble / k
          val variance = q.toDouble / k - mean * mean
          if (variance > 0) {
            val z = (n - mean) / math.sqrt(variance)
            val zr = BigDecimal(z) // HALF_UP: what Spark's round() does
              .setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
            out += AnomalyRow(typ, m, n, zr, if (z > 3) 1 else 0)
          }
        }
        ring = (ring :+ n).takeRight(baselineMinutes)
      }
      st = AnomalyState(stillOpen, ring)
      state.update(st)
      // Wake when the earliest still-open minute becomes closable (its
      // end is strictly past the watermark, so the timestamp is valid).
      if (st.open.nonEmpty)
        state.setTimeoutTimestamp((st.open.keys.min + minuteUs) / 1000L)
      out.result().iterator
    }

    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Streaming as-of join — the incremental twin of q109's native
    * batch operator: every purchase attaches the LATEST click at-or-
    * before it for the same user, within `toleranceUs` (null when none;
    * exactly q109's output contract, proven row-equal by the spec).
    *
    * Event-time correctness under out-of-order arrival comes from the
    * watermark, not arrival order: a purchase is held until the
    * watermark passes its timestamp — at which point every click that
    * could precede it has, by the watermark contract, arrived — and
    * only then matched and emitted. Clicks buffer under the same rule
    * and are pruned to the provably-still-useful set: any future
    * purchase carries t > watermark, so (a) a click superseded by a
    * LATER click at-or-under the watermark can never be the latest
    * again, and (b) a click at-or-under watermark − tolerance is out
    * of range forever. Steady-state per-key state is therefore ONE
    * matured click plus the in-horizon tail — O(events in the
    * watermark horizon), never history, which is what lets the join
    * run indefinitely at 100 TB/day. Event-time timeouts flush pending
    * purchases (and expire the last click) when a key goes quiet.
    */
  def asOfJoinWithState(
      events: Dataset[StreamEvent],
      toleranceUs: Long = 3600L * 1000000L): Dataset[AsOfRow] = {
    implicit val bufEnc: Encoder[AsOfBuf] = Encoders.product[AsOfBuf]
    implicit val rowEnc: Encoder[AsOfRow] = Encoders.product[AsOfRow]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong

    def update(
        user: Long, rows: Iterator[StreamEvent],
        state: GroupState[AsOfBuf]): Iterator[AsOfRow] = {
      var st = state.getOption.getOrElse(AsOfBuf(Vector.empty, Vector.empty))
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      if (!state.hasTimedOut) rows.foreach { e =>
        val us = micros(e.ts)
        // flatMapGroupsWithState does NOT drop beyond-horizon rows for
        // us ([[scd2WithState]]'s contract note). A late purchase here
        // would mature INSTANTLY against a click buffer already pruned
        // of its true predecessors and emit a wrong match; a late click
        // could likewise resurrect into the buffer after its window.
        // Enforce the watermark contract explicitly: late rows drop.
        if (us > wmUs) {
          if (e.event_type == "click") st = st.copy(clicks = st.clicks :+ us)
          else if (e.event_type == "purchase")
            st = st.copy(pend = st.pend :+ PendingPurchase(e.event_id, us))
        }
      }
      // Duplicate click timestamps are indistinguishable downstream
      // (q109 projects the matched TIMESTAMP, not an id) — dedup them.
      val clicks = st.clicks.distinct.sorted
      val (matured, stay) = st.pend.partition(_.t <= wmUs)
      val out = matured.sortBy(p => (p.t, p.event_id)).map { p =>
        val m = clicks.takeWhile(_ <= p.t).lastOption.filter(c => p.t - c <= toleranceUs)
        AsOfRow(user, p.event_id, p.t, m, m.map(p.t - _))
      }
      val lastMatured = clicks.filter(_ <= wmUs).lastOption
      val kept = clicks.filter(c =>
        c > wmUs || (lastMatured.contains(c) && c > wmUs - toleranceUs))
      st = AsOfBuf(kept, stay)
      if (st.clicks.isEmpty && st.pend.isEmpty) state.remove()
      else {
        state.update(st)
        // Wake when the earliest pending purchase matures, or when the
        // newest click ages past the tolerance horizon (state GC) —
        // both are strictly past the current watermark by construction.
        val wakeUs = (st.pend.map(_.t) ++
          st.clicks.lastOption.map(_ + toleranceUs)).min
        state.setTimeoutTimestamp(wakeUs / 1000L + 1L)
      }
      out.iterator
    }

    events
      // Note: Catalyst pushes the type filter below the watermark node
      // (it doesn't reference ts), so only click/purchase rows advance
      // this operator's event-time clock — a stretch of traffic with
      // neither type holds maturation at the last click/purchase time,
      // which is the conservative (never-wrong) behavior.
      .withWatermark("ts", "1 hour")
      .filter(col("event_type").isin("click", "purchase"))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Streaming multi-touch attribution — the incremental twin of
    * q147's fractional credit split: a purchase's answer is final once
    * the watermark passes its event time (every click at-or-under the
    * watermark is complete, and a future click arrives strictly after
    * the purchase so it can never enter the look-back window). Each
    * maturing purchase splits 1e6 micro-credits across its user's
    * clicks in the preceding `windowMinutes`, grouped by channel —
    * exact integer arithmetic, the same (1e6·a) div n as the batch
    * query, so aggregating the emitted rows per channel reproduces
    * q147's declared output bit-for-bit (spec-proven). Clicks prune
    * once the watermark passes tc + window (no live or future purchase
    * can look back that far), so state is O(events in the horizon);
    * beyond-horizon arrivals are dropped explicitly (same contract as
    * [[scd2WithState]]).
    */
  def attributionWithState(
      events: Dataset[AttrEvent],
      windowMinutes: Int = 30): Dataset[CreditRow] = {
    val windowUs = windowMinutes * 60L * 1000000L
    implicit val bufEnc: Encoder[AttrBuf] = Encoders.product[AttrBuf]
    implicit val rowEnc: Encoder[CreditRow] = Encoders.product[CreditRow]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong

    def update(
        user: Long, rows: Iterator[AttrEvent],
        state: GroupState[AttrBuf]): Iterator[CreditRow] = {
      var st = state.getOption.getOrElse(AttrBuf(Vector.empty, Vector.empty))
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      if (!state.hasTimedOut) rows.foreach { e =>
        val us = micros(e.ts)
        if (us > wmUs) { // beyond-horizon arrivals dropped explicitly
          if (e.event_type == "click")
            st = st.copy(clicks = st.clicks :+ (us, e.channel))
          else if (e.event_type == "purchase")
            st = st.copy(pend = st.pend :+ PendingPurchase(e.event_id, us))
        }
      }
      val (matured, stay) = st.pend.partition(_.t <= wmUs)
      val out = matured.sortBy(p => (p.t, p.event_id)).flatMap { p =>
        val inWin = st.clicks.filter { case (tc, _) =>
          tc < p.t && tc >= p.t - windowUs
        }
        val n = inWin.size.toLong
        inWin.groupBy(_._2).toSeq.sortBy(_._1).map { case (ch, cs) =>
          val a = cs.size.toLong
          CreditRow(user, p.event_id, ch, a, 1000000L * a / n)
        }
      }
      // Clicks stay while a live or future purchase can still reach
      // back to them: tc + window > watermark.
      val kept = st.clicks.filter { case (tc, _) => tc + windowUs > wmUs }
      st = AttrBuf(kept, stay)
      if (st.clicks.isEmpty && st.pend.isEmpty) state.remove()
      else {
        state.update(st)
        // Wake at the earliest pending maturation, or when the oldest
        // click ages out (state GC) — both strictly past the watermark.
        val wakeUs = (st.pend.map(_.t) ++
          st.clicks.map { case (tc, _) => tc + windowUs }).min
        state.setTimeoutTimestamp(wakeUs / 1000L + 1L)
      }
      out.iterator
    }

    events
      .withWatermark("ts", "1 hour")
      .filter(col("event_type").isin("click", "purchase"))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Streaming SCD Type-2 history build — the incremental twin of
    * q142's run collapse: per user, each maturing state CHANGE closes
    * the previous validity interval and emits it; the open current
    * interval stays in state (the dimension's current-state row — a
    * stream can never close it, so the emitted surface is exactly
    * q142's `valid_to IS NOT NULL` rows, versions included).
    *
    * Out-of-order safety: an event mutates history only after the
    * watermark passes it, and matured events fold in (ts, event_id)
    * order — the same total order as the batch window — so a late
    * event inside the horizon lands between the right neighbors and a
    * replay converges to the all-at-once result (spec-proven). State
    * is O(events in the watermark horizon + 1 committed row) per
    * active user; the event-time timeout wakes idle users exactly when
    * their earliest pending event matures, so emission never waits for
    * the user's next event.
    */
  def scd2WithState(events: Dataset[StreamEvent]): Dataset[Scd2Row] = {
    implicit val bufEnc: Encoder[Scd2Buf] = Encoders.product[Scd2Buf]
    implicit val rowEnc: Encoder[Scd2Row] = Encoders.product[Scd2Row]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong

    def update(
        user: Long, rows: Iterator[StreamEvent],
        state: GroupState[Scd2Buf]): Iterator[Scd2Row] = {
      var st = state.getOption.getOrElse(Scd2Buf(Vector.empty, "", 0L, 0))
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      if (!state.hasTimedOut) rows.foreach { e =>
        val us = micros(e.ts)
        // flatMapGroupsWithState does NOT drop beyond-horizon rows for
        // us. Folding one in here would rewrite already-committed
        // history out of order, so enforce the watermark contract
        // explicitly: an event later than the horizon is dropped.
        if (us > wmUs)
          st = st.copy(pending = st.pending :+ PendingState(us, e.event_id, e.event_type))
      }
      val (matured, stay) = st.pending.partition(_.t <= wmUs)
      val out = Seq.newBuilder[Scd2Row]
      var (cur, from, ver) = (st.curState, st.curFromUs, st.curVersion)
      matured.sortBy(p => (p.t, p.event_id)).foreach { p =>
        if (ver == 0) { cur = p.state; from = p.t; ver = 1 }
        else if (cur != p.state) {
          out += Scd2Row(user, cur, from, p.t, ver)
          cur = p.state; from = p.t; ver += 1
        } // same state: the run continues, nothing closes
      }
      state.update(Scd2Buf(stay, cur, from, ver))
      // Wake when the earliest immature event matures (strictly past
      // the current watermark by construction of the partition).
      if (stay.nonEmpty) state.setTimeoutTimestamp(stay.map(_.t).min / 1000L + 1L)
      out.result().iterator
    }

    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Streaming snapshot-drift monitor — the incremental twin of
    * q148's validation gate: per event type, count the new batch's
    * events into minute buckets and emit each bucket when the
    * watermark closes it, carrying the broadcast at-rest baseline
    * count for the type (the q145/q148 hwm artifact's per-type
    * aggregate — bounded by the type alphabet, shipped in the task
    * closure exactly like a broadcast dim). A bucket's count is final
    * at emission: every event at-or-under the watermark has arrived,
    * and beyond-horizon stragglers are dropped explicitly on arrival
    * (flatMapGroupsWithState does not enforce the watermark contract
    * for us), so the emitted row set is a pure function of the event
    * set — any replay order inside the horizon converges
    * (spec-proven). Summing n_new per type and applying q148's
    * share/ratio arithmetic over these bounded rows reproduces the
    * batch drift report bit-for-bit; minute grain means the monitor
    * can also flag drift MID-batch instead of once per ingest.
    * State is O(open minutes) per type — arrivals fold directly into
    * their bucket (see [[DriftBuf]]: an in-horizon event's bucket is
    * provably still open, so counts need no maturation stage and a
    * hot type holds ~61 map entries, not one Long per event); the
    * event-time timeout wakes a type exactly when its oldest open
    * bucket closes.
    */
  def driftWithState(
      events: Dataset[StreamEvent],
      baseline: Map[String, Long]): Dataset[DriftRow] = {
    val minuteUs = 60L * 1000000L
    implicit val bufEnc: Encoder[DriftBuf] = Encoders.product[DriftBuf]
    implicit val rowEnc: Encoder[DriftRow] = Encoders.product[DriftRow]
    implicit val keyEnc: Encoder[String] = Encoders.STRING

    def update(
        tpe: String, rows: Iterator[StreamEvent],
        state: GroupState[DriftBuf]): Iterator[DriftRow] = {
      var open = state.getOption.getOrElse(DriftBuf(Map.empty)).open
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      if (!state.hasTimedOut) rows.foreach { e =>
        val us = micros(e.ts)
        if (us > wmUs) { // beyond-horizon arrivals dropped explicitly
          // An in-horizon arrival's bucket is still open (us > wm and
          // us < b + minute force b + minute > wm), so the count folds
          // in directly — no per-event buffering.
          val b = us - us % minuteUs
          open = open.updated(b, open.getOrElse(b, 0L) + 1L)
        }
      }
      val (closed, keep) = open.partition { case (b, _) => b + minuteUs <= wmUs }
      val out = closed.toSeq.sortBy(_._1).map { case (b, n) =>
        DriftRow(tpe, b, n, baseline.getOrElse(tpe, 0L))
      }
      if (keep.isEmpty) state.remove()
      else {
        state.update(DriftBuf(keep))
        // Wake when the oldest open bucket closes — strictly past the
        // current watermark by construction.
        val wakeUs = keep.keys.map(_ + minuteUs).min
        state.setTimeoutTimestamp(wakeUs / 1000L + 1L)
      }
      out.iterator
    }

    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Streaming FORWARD as-of join — the incremental twin of q117's
    * time-to-conversion: every click attaches the EARLIEST purchase
    * at-or-after it within `toleranceUs` (null when none). A click's
    * answer is final once the watermark passes min(earliest arrived
    * qualifying purchase, click + tolerance): purchases at-or-under
    * the watermark are complete by the watermark contract, and any
    * future purchase arrives strictly later than both bounds, so it
    * can neither beat an emitted match nor fill an emitted null.
    * Purchase timestamps prune once they are at-or-under the watermark
    * AND before every pending click — forward joins only look ahead —
    * so state is again O(events in the watermark horizon).
    */
  def asOfForwardWithState(
      events: Dataset[StreamEvent],
      toleranceUs: Long = 3600L * 1000000L): Dataset[AsOfFwdRow] = {
    implicit val bufEnc: Encoder[AsOfFwdBuf] = Encoders.product[AsOfFwdBuf]
    implicit val rowEnc: Encoder[AsOfFwdRow] = Encoders.product[AsOfFwdRow]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong

    def update(
        user: Long, rows: Iterator[StreamEvent],
        state: GroupState[AsOfFwdBuf]): Iterator[AsOfFwdRow] = {
      var st = state.getOption.getOrElse(AsOfFwdBuf(Vector.empty, Vector.empty))
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      if (!state.hasTimedOut) rows.foreach { e =>
        val us = micros(e.ts)
        // Beyond-horizon arrivals dropped explicitly (the backward
        // operator's note): a late click would otherwise emit a FINAL
        // NULL against a purchase buffer already pruned of the
        // purchases that answered its window.
        if (us > wmUs) {
          if (e.event_type == "purchase") st = st.copy(purchases = st.purchases :+ us)
          else if (e.event_type == "click")
            st = st.copy(clicks = st.clicks :+ PendingClick(e.event_id, us))
        }
      }
      // q117 projects the matched purchase TIMESTAMP, so duplicate
      // purchase instants are indistinguishable — dedup them.
      val purchases = st.purchases.distinct.sorted
      val out = Vector.newBuilder[AsOfFwdRow]
      val stay = Vector.newBuilder[PendingClick]
      st.clicks.sortBy(c => (c.t, c.event_id)).foreach { c =>
        val pmin = purchases.find(p => p >= c.t && p - c.t <= toleranceUs)
        pmin match {
          case Some(p) if p <= wmUs =>
            out += AsOfFwdRow(user, c.event_id, c.t, Some(p), Some(p - c.t))
          case _ if c.t + toleranceUs <= wmUs =>
            // The whole tolerance window is at-or-under the watermark
            // and holds no qualifying purchase: the null is final.
            out += AsOfFwdRow(user, c.event_id, c.t, None, None)
          case _ => stay += c
        }
      }
      val pendClicks = stay.result()
      val minClickT = pendClicks.map(_.t).minOption
      val kept = purchases.filter(p => p > wmUs || minClickT.exists(p >= _))
      st = AsOfFwdBuf(pendClicks, kept)
      if (st.clicks.isEmpty && st.purchases.isEmpty) state.remove()
      else {
        state.update(st)
        // Wake when the earliest pending click's answer becomes final,
        // or (clicks drained) when the buffered purchases age out.
        val wakes =
          st.clicks.map(c =>
            (purchases.find(p => p >= c.t && p - c.t <= toleranceUs).toList
              :+ (c.t + toleranceUs)).min) ++
            (if (st.clicks.isEmpty) st.purchases.lastOption.toVector else Vector.empty)
        state.setTimeoutTimestamp(wakes.min / 1000L + 1L)
      }
      out.result().iterator
    }

    events
      .withWatermark("ts", "1 hour")
      .filter(col("event_type").isin("click", "purchase"))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** File-source incremental pipeline: watch a directory of parquet
    * drops, maintain tumbling aggregates, append to parquet. The
    * checkpoint makes it exactly-once per output epoch.
    */
  def runFileStream(spark: org.apache.spark.sql.SparkSession,
                    srcDir: String, outDir: String, checkpointDir: String,
                    schema: org.apache.spark.sql.types.StructType): StreamingQuery =
    tumblingCounts(spark.readStream.schema(schema).parquet(srcDir))
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .option("path", outDir)
      .start()
}
