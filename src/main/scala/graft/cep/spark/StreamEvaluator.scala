package graft.cep.spark

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import graft.cep._

/**
 * Streaming CEP evaluation: `withWatermark` + `flatMapGroupsWithState` keyed by `key`, the
 * Structured-Streaming replacement for the reference's synchronous event loop. State per key
 * holds (a) a small reorder buffer of not-yet-watermark-complete events and (b) the engine
 * snapshot (per-node partial-match buffers + pending negation matches), checkpointed by the
 * state store for exactly-once resumability (the north rule's requirement).
 *
 * Correctness model: events are only fed to the engine once the watermark passes their
 * event time, in (ts, idx) order — so the streaming evaluator is deterministic under any
 * micro-batch slicing and any bounded disorder, and equals the batch evaluator (property
 * tested). The reference, by contrast, silently mis-evaluates out-of-order input
 * (/root/reference/tree/nodes/LeafNode.py:85-98).
 */
object StreamEvaluator {

  /** Local-mode diagnostic counters for the stateful operator (single-JVM only — on a
    * real cluster these stay per-executor; use Spark metrics there). Negligible overhead:
    * a few nanoTime calls per key visit. */
  object Prof {
    import java.util.concurrent.atomic.AtomicLong
    val keyVisits = new AtomicLong
    val rowsIn = new AtomicLong
    val readNs = new AtomicLong
    val feedNs = new AtomicLong
    val writeNs = new AtomicLong
    def reset(): Unit = Seq(keyVisits, rowsIn, readNs, feedNs, writeNs).foreach(_.set(0))
    def summary: String =
      f"keyVisits=${keyVisits.get} rowsIn=${rowsIn.get} readMs=${readNs.get / 1000000} " +
        f"feedMs=${feedNs.get / 1000000} writeMs=${writeNs.get / 1000000}"
  }

  /** Matches with event-time watermark semantics. `delayMicros` is the allowed lateness.
    * Late events (ts below the watermark at arrival) are dropped by the watermark filter,
    * exactly like any Spark stateful op.
    *
    * Per-key state (reorder buffer + engine snapshot) is stored as a [[StateCodec]] byte
    * array through the BINARY encoder: the hand-rolled codec (string/event back-reference
    * dedup, no reflection, no class metadata) replaced generic Kryo, which dominated the
    * per-row streaming cost. Restart safety needs no output dedup: the state store commits
    * transactionally per micro-batch, so a replayed batch starts from the replayed state
    * version. */
  /** CAVEAT (restart vs plan edits): the plan fingerprint covers tree SHAPE, window and
    * policies — NOT condition lambdas (functions have no stable identity across JVMs).
    * Editing only a condition between restarts reuses state admitted under the old
    * predicate; such edits require a fresh checkpoint. A shape-changing edit migrates
    * state by leaf replay (MATCH_ANY) or drops it with a logged warning (policy patterns —
    * replay would bypass freeze admission / double-consume single budgets). */
  private val migrateWarned = new java.util.concurrent.atomic.AtomicBoolean(false)
  private val oldPlanDropWarned = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** `assumeOrdered = true` drops the reorder buffer: each micro-batch's events are fed
    * immediately in (ts, idx) order, trusting the source to deliver every key's events in
    * non-decreasing event-time order across batches (a time-sliced replay, or any source
    * with per-key ordering). This is exactly the arrival model the reference engine
    * assumes for ALL input (/root/reference/tree/nodes/LeafNode.py:85-98) — and it halves
    * key visits and state rewrites, because events no longer wait one watermark cycle in
    * the buffer. The default stays the stronger watermark-complete mode, which is
    * deterministic under arbitrary disorder. */
  /** `previousOrder`: when restarting a checkpointed query with a CHANGED join order,
    * passing the order the checkpoint was written under enables the in-flight
    * SIMULTANEOUS swap (SimultaneousTreeBasedEvaluationMechanism.py:14-92): each key runs
    * the retiring plan alongside the new one for one window — no partial-match loss, no
    * leaf replay — then retires it. Without it, a fingerprint mismatch falls back to
    * leaf-replay migration (the reference's trivial swap). MATCH_ANY patterns only. */
  def evaluate(
      events: Dataset[Ev],
      patterns: Seq[Pattern],
      delay: String = "10 seconds",
      assumeOrdered: Boolean = false,
      order: Orders.Strategy = Orders.Trivial,
      previousOrder: Option[Orders.Strategy] = None): Dataset[CepMatch] = {
    val spark = events.sparkSession
    import spark.implicits._ // provides the BINARY encoder for the byte-array state
    val compiled = patterns.flatMap(p => Compiler.compile(p, order)).toIndexedSeq
    val oldCompiled = previousOrder.map(po =>
      patterns.flatMap(p => Compiler.compile(p, po)).toIndexedSeq)
    val types = compiled.flatMap(_.relevantTypes).distinct

    val maxWindowMs = compiled.map(_.windowMicros).max / 1000L
    events
      .filter(col("etype").isin(types: _*))
      .withColumn("eventTime", timestamp_micros(col("ts")))
      .withWatermark("eventTime", delay)
      .as[Ev]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        processKey(compiled, maxWindowMs, assumeOrdered, oldCompiled))
  }

  /** Streaming skew handling: the north rule's "salted repartitioning with a merge
    * stage" ON THE STREAM — [[Rip]]'s RIP time-pane salting applied to the stateful
    * path. Under plain [[evaluate]] a hot conversation serializes on one state-store
    * key: every micro-batch, one task deserializes that key's ever-larger engine
    * snapshot, feeds the hot key's entire batch share, and rewrites the snapshot. Here
    * each event row is exploded to its replication panes by the SAME Catalyst pane
    * array the batch path uses ([[Rip.paneArray]]: replication factor 1 + window/pane,
    * negative-type back-replication only when the pattern shape admits a negative
    * before the first positive), and state is keyed by (key, pane) — the hot
    * conversation's state and per-batch work fan out over ceil(span/pane) parallel
    * state keys, each bounded by pane + window micros of events. The merge stage is the
    * owner filter: a match is emitted only by the pane containing its firstTs (the
    * sentinel cold pane owns everything), so each match appears exactly once.
    *
    * `hotKeys = None` salts every key; `Some(keys)` replicates only those keys and
    * routes the rest through the sentinel pane IN THE SAME shuffle — cold keys then
    * have exactly the plain path's per-key grouping (no replication, no owner filter).
    * Streaming cannot pre-scan the input to detect hot keys the way
    * [[Rip.evaluateAuto]] does; supply the hot set from prior statistics
    * ([[Stats.arrivalRates]] over history, or a batch detection pass) and restart the
    * query to re-route — routing is never a correctness decision, both paths produce
    * identical matches for any key.
    *
    * Pane state lifecycle needs no extra machinery: a pane's engine goes quiescent once
    * the watermark passes its last event + window (pruneExpired + isQuiescent in
    * [[step]]), so the state store holds ~(1 + window/pane) live pane entries per hot
    * key, not its history. Same MATCH_ANY-only restriction as batch salting
    * (single/freeze/next consumption policies carry cross-pane state). Checkpoint
    * resume works unchanged — (key, pane) is just the grouping key. Plan-change
    * migration (`previousOrder`) is not offered on this path: changing pattern shape
    * or pane width re-keys the state; restart skewed queries from a fresh checkpoint. */
  def evaluateSalted(
      events: Dataset[Ev],
      patterns: Seq[Pattern],
      paneMicros: Long,
      delay: String = "10 seconds",
      hotKeys: Option[Seq[String]] = None,
      assumeOrdered: Boolean = false,
      order: Orders.Strategy = Orders.Trivial): Dataset[CepMatch] = {
    val spark = events.sparkSession
    import spark.implicits._
    Rip.requireSaltable(patterns, paneMicros)
    val window = patterns.map(_.windowMicros).max
    val compiled = patterns.flatMap(p => Compiler.compile(p, order)).toIndexedSeq
    val types = compiled.flatMap(_.relevantTypes).distinct
    val maxWindowMs = compiled.map(_.windowMicros).max / 1000L
    val panes = Rip.paneArray(compiled, window, paneMicros, hotKeys.map(_.toArray))
    events
      .filter(col("etype").isin(types: _*))
      .withColumn("eventTime", timestamp_micros(col("ts")))
      .withWatermark("eventTime", delay)
      .withColumn("pane", explode(panes))
      .as[PanedEv]
      .groupByKey(pe => (pe.key, pe.pane))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        processPane(compiled, maxWindowMs, assumeOrdered, paneMicros))
  }

  /** [[processKey]] plus the owner-pane merge: only matches whose firstTs falls in the
    * group's pane are emitted (the cold sentinel pane owns the whole time line). */
  private def processPane(compiled: IndexedSeq[CompiledPattern], maxWindowMs: Long,
                          assumeOrdered: Boolean, paneMicros: Long)(
      key: (String, Long),
      rows: Iterator[PanedEv],
      state: GroupState[Array[Byte]]): Iterator[CepMatch] = {
    val res = step(compiled, maxWindowMs, assumeOrdered, state.getOption,
      rows.map(_.toEv).toVector, state.getCurrentWatermarkMs())
    res.state match {
      case Some(bytes) =>
        state.update(bytes)
        res.wakeAtMs.foreach(state.setTimeoutTimestamp)
      case None => state.remove()
    }
    val (lo, hi) =
      if (key._2 == Rip.ColdPane) (Long.MinValue, Long.MaxValue)
      else (key._2 * paneMicros, key._2 * paneMicros + paneMicros)
    res.matches.iterator.filter(m => m.firstTs >= lo && m.firstTs < hi)
  }

  /** One per-key state transition: (stored state, incoming events, watermark) ->
    * (matches, new state bytes or None when the key goes quiescent, next wakeup time).
    * Shared verbatim by the flatMapGroupsWithState path and the transformWithState path —
    * the two differ only in how state bytes and timers are plumbed. */
  private[spark] final case class StepOut(matches: Vector[CepMatch],
                                          state: Option[Array[Byte]],
                                          wakeAtMs: Option[Long])

  private[spark] def step(compiled: IndexedSeq[CompiledPattern], maxWindowMs: Long,
                          assumeOrdered: Boolean, stored: Option[Array[Byte]],
                          incoming: Vector[Ev], watermarkMs: Long,
                          oldCompiled: Option[IndexedSeq[CompiledPattern]] = None): StepOut = {
    var t0 = System.nanoTime()
    Prof.keyVisits.incrementAndGet()
    val fingerprint = Adaptive.fingerprint(compiled)
    val oldFp = oldCompiled.map(Adaptive.fingerprint)
    val policyFree = compiled.forall(cp => cp.singleAt.isEmpty && cp.freezeMap.isEmpty)
    var engine = new MatchEngine(compiled)
    val maxWindow = maxWindowMs * 1000L
    val watermark = watermarkMs * 1000L // ms -> micros
    // In-flight simultaneous swap (the reference's
    // SimultaneousTreeBasedEvaluationMechanism.py:14-92): during a per-key transition the
    // RETIRING plan's engine also runs; only ITS matches are emitted (it has seen every
    // event, so it finds everything the new engine finds), and the new engine builds state
    // silently. `firstFedTs` = event time of the first event the new engine saw; matches
    // with firstTs before it necessarily use an event only the old engine has. Retirement
    // happens one window after that boundary, when every old-only match is complete.
    var trans: Option[(MatchEngine, Long, Long)] = None // (old engine, startWm, firstFedTs)
    val prevPending: Vector[Ev] = stored match {
      case Some(bytes) =>
        val d = StateCodec.read(bytes)
        if (d.fp == fingerprint) {
          engine.restore(d.engine)
          d.old.foreach { o =>
            if (oldFp.contains(o.fp) && policyFree) {
              val oe = new MatchEngine(oldCompiled.get)
              oe.restore(o.engine)
              trans = Some((oe, o.startWm, o.firstFedTs))
            } else {
              // The previousOrder no longer matches the stored transition (plan changed
              // again mid-transition, or previousOrder was dropped) — abandon the old
              // tree. The new engine owns every match from firstFedTs on, but OLD-ONLY
              // matches (firstTs < firstFedTs) still pending in the retiring engine are
              // LOST — warn so operators keep previousOrder stable until retirement.
              if (oldPlanDropWarned.compareAndSet(false, true))
                System.err.println(s"[graft] stored in-flight transition discarded: " +
                  s"previousOrder is ${if (oldFp.isEmpty) "absent" else "a different plan"} " +
                  s"(stored old fp ${o.fp}, supplied ${oldFp.getOrElse("none")}). Matches " +
                  s"started before the swap boundary may be dropped; keep previousOrder " +
                  s"unchanged until the transition retires (one window past the swap).")
            }
          }
        } else if (oldFp.contains(d.fp) && policyFree) {
          // restart under a NEW plan with previousOrder = the stored plan: begin the
          // simultaneous transition — old engine restored intact, new engine empty
          val oe = new MatchEngine(oldCompiled.get)
          oe.restore(d.engine)
          trans = Some((oe, watermark, Long.MaxValue))
        } else if (policyFree)
          // no previous-plan spec available: migrate by leaf-event replay —
          // the reference's trivial tree swap (graft.cep.Adaptive)
          engine = Adaptive.migrate(d.engine, compiled)
        else {
          // policy patterns cannot migrate (replay bypasses freeze admission and
          // double-consumes single/next budgets): drop this key's engine state instead
          // of crash-looping the restarted query. Held reorder-buffer events are raw
          // input, not plan state — they replay safely through the fresh engine.
          if (migrateWarned.compareAndSet(false, true))
            System.err.println(s"[graft] plan fingerprint changed under a consumption-policy " +
              s"pattern: dropping per-key engine state (partial matches lost; reorder-buffer " +
              s"events kept). Restart policy patterns from a fresh checkpoint to avoid this.")
        }
        d.pending
      case None => Vector.empty
    }
    Prof.readNs.addAndGet(System.nanoTime() - t0)

    Prof.rowsIn.addAndGet(incoming.length)
    val all = (prevPending ++ incoming).sortBy(e => (e.ts, e.idx))
    // feed only the watermark-complete prefix: events at ts >= watermark may still gain
    // earlier-or-tied siblings in later batches, so they wait in the reorder buffer
    // (unless the source guarantees per-key order — then everything is ready now)
    val (ready, hold) =
      if (assumeOrdered) (all, Vector.empty[Ev]) else all.partition(_.ts < watermark)

    t0 = System.nanoTime()
    val out = Vector.newBuilder[CepMatch]
    trans match {
      case Some((oldEng, startWm, firstFed0)) =>
        val firstFed =
          if (firstFed0 != Long.MaxValue) firstFed0
          else ready.headOption.map(_.ts).getOrElse(Long.MaxValue)
        val sink = (m: CepMatch) => { out += m; () }
        val discard = (_: CepMatch) => ()
        ready.foreach { e => oldEng.feedEach(e)(sink); engine.feedEach(e)(discard) }
        out ++= oldEng.advance(watermark); engine.advance(watermark)
        oldEng.pruneExpired(watermark)
        val maxSeen = ready.lastOption.map(_.ts).getOrElse(Long.MinValue)
        val bound = if (firstFed != Long.MaxValue) firstFed else startWm
        if (math.max(maxSeen, watermark) > bound + maxWindow) {
          // retire: hand over the old tree's parked (unbounded-negation) matches that the
          // new tree cannot know — those whose first event predates anything it saw. The
          // reference flushes ALL pending at handover (SimultaneousTree...py:61-66 +
          // Tree.get_last_matches); filtering at firstFedTs additionally prevents
          // double-emission of parked matches the new tree holds a copy of. Safe to flush
          // now: such a match's events all predate firstFed + window < watermark, so an
          // invalidating negative (window-bounded like every match member,
          // /root/reference/tree/nodes/Node.py:187-193) can no longer arrive.
          out ++= oldEng.finish().filter(_.firstTs < firstFed)
          trans = None
        } else trans = Some((oldEng, startWm, firstFed))
      case None =>
        val sink = (m: CepMatch) => { out += m; () }
        ready.foreach(e => engine.feedEach(e)(sink))
        out ++= engine.advance(watermark)
    }
    Prof.feedNs.addAndGet(System.nanoTime() - t0)

    // bound state and wakeups: expired buffers can never combine with future events
    // (ts >= watermark), so prune them; a fully quiescent key is removed from the state
    // store entirely — otherwise every key would be rescanned on every micro-batch
    t0 = System.nanoTime()
    engine.pruneExpired(watermark)
    val res =
      if (hold.isEmpty && engine.isQuiescent && trans.isEmpty) StepOut(out.result(), None, None)
      else {
        val oldSection = trans.map { case (oe, startWm, firstFed) =>
          StateCodec.OldPlan(oldFp.get, startWm, firstFed, oe.snapshot())
        }
        val bytes = StateCodec.write(fingerprint, hold, engine.snapshot(), oldSection)
        val wake =
          if (hold.nonEmpty || engine.hasPending || trans.isDefined)
            // wake on watermark advance to release held events / parked negation matches
            // (and to drive a transition toward retirement even if no events arrive)
            watermarkMs + 1000L
          else
            // live buffers only matter when new data arrives, but if none ever does the
            // key must still be reaped: one wakeup after the longest pattern window has
            // certainly passed lets pruneExpired + isQuiescent remove the entry — a
            // far-future timer would retain one-shot keys forever on a long-running stream
            watermarkMs + maxWindowMs + 1000L
        StepOut(out.result(), Some(bytes), Some(wake))
      }
    Prof.writeNs.addAndGet(System.nanoTime() - t0)
    res
  }

  private def processKey(compiled: IndexedSeq[CompiledPattern], maxWindowMs: Long,
                         assumeOrdered: Boolean = false,
                         oldCompiled: Option[IndexedSeq[CompiledPattern]] = None)(
      key: String,
      rows: Iterator[Ev],
      state: GroupState[Array[Byte]]): Iterator[CepMatch] = {
    val res = step(compiled, maxWindowMs, assumeOrdered, state.getOption, rows.toVector,
      state.getCurrentWatermarkMs(), oldCompiled)
    res.state match {
      case Some(bytes) =>
        state.update(bytes)
        res.wakeAtMs.foreach(state.setTimeoutTimestamp)
      case None => state.remove()
    }
    res.matches.iterator
  }

  /** The same evaluator on Spark's `transformWithState` (state-store v2) API: granular
    * per-key ValueState + explicit timers over the RocksDB provider, replacing
    * flatMapGroupsWithState's whole-store commit path. Output, state transitions and
    * wakeup times are IDENTICAL to [[evaluate]] — both call [[step]]; only the state/timer
    * plumbing differs. Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass = ...RocksDBStateStoreProvider`). */
  def evaluateTws(
      events: Dataset[Ev],
      patterns: Seq[Pattern],
      delay: String = "10 seconds",
      assumeOrdered: Boolean = false,
      order: Orders.Strategy = Orders.Trivial,
      previousOrder: Option[Orders.Strategy] = None): Dataset[CepMatch] = {
    val spark = events.sparkSession
    import spark.implicits._
    val compiled = patterns.flatMap(p => Compiler.compile(p, order)).toIndexedSeq
    val oldCompiled = previousOrder.map(po =>
      patterns.flatMap(p => Compiler.compile(p, po)).toIndexedSeq)
    val types = compiled.flatMap(_.relevantTypes).distinct
    val maxWindowMs = compiled.map(_.windowMicros).max / 1000L
    events
      .filter(col("etype").isin(types: _*))
      .withColumn("eventTime", timestamp_micros(col("ts")))
      .withWatermark("eventTime", delay)
      .as[Ev]
      .groupByKey(_.key)
      .transformWithState(
        new CepStatefulProcessor(compiled, maxWindowMs, assumeOrdered, oldCompiled),
        TimeMode.EventTime(), OutputMode.Append())
  }
}

/** An [[Ev]] tagged with its replication pane — the typed row of the streaming salted
  * path ([[StreamEvaluator.evaluateSalted]]). Field order mirrors Ev so the post-explode
  * frame maps by name. */
private[spark] final case class PanedEv(key: String, idx: Long, etype: String, ts: Long,
                                        num: Double, s1: String, s2: String, prob: Double,
                                        pane: Long) {
  def toEv: Ev = Ev(key, idx, etype, ts, num, s1, s2, prob)
}

/** transformWithState plumbing around [[StreamEvaluator.step]]: byte-array ValueState for
  * the codec envelope, and exactly one live timer per key (reconciled via listTimers —
  * registerTimer accumulates otherwise, turning every historical wakeup into a spurious
  * key visit). */
private[spark] class CepStatefulProcessor(compiled: IndexedSeq[CompiledPattern],
                                          maxWindowMs: Long, assumeOrdered: Boolean,
                                          oldCompiled: Option[IndexedSeq[CompiledPattern]] = None)
    extends StatefulProcessor[String, Ev, CepMatch] {
  @transient private var st: ValueState[Array[Byte]] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[Array[Byte]]("cep", Encoders.BINARY, TTLConfig.NONE)

  private def visit(rows: Iterator[Ev], watermarkMs: Long): Iterator[CepMatch] = {
    val res = StreamEvaluator.step(compiled, maxWindowMs, assumeOrdered,
      if (st.exists()) Some(st.get()) else None, rows.toVector, watermarkMs, oldCompiled)
    val handle = getHandle
    val existing = handle.listTimers().toList
    res.state match {
      case Some(bytes) =>
        st.update(bytes)
        res.wakeAtMs.foreach { w =>
          existing.foreach { t => if (t != w) handle.deleteTimer(t) }
          if (!existing.contains(w)) handle.registerTimer(w)
        }
      case None =>
        st.clear()
        existing.foreach(handle.deleteTimer)
    }
    res.matches.iterator
  }

  override def handleInputRows(key: String, rows: Iterator[Ev],
                               timerValues: TimerValues): Iterator[CepMatch] =
    visit(rows, timerValues.getCurrentWatermarkInMs())

  override def handleExpiredTimer(key: String, timerValues: TimerValues,
                                  expiredTimerInfo: ExpiredTimerInfo): Iterator[CepMatch] =
    visit(Iterator.empty, timerValues.getCurrentWatermarkInMs())
}
