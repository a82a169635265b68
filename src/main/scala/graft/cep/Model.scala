package graft.cep

/**
 * Engine-internal event representation.
 *
 * Mirrors the reference's `Event` (payload dict + type + timestamp + optional probability,
 * /root/reference/base/Event.py:6-33) but with a fixed, Encoder-friendly shape. Domain
 * adapters (transcripts, the driver's `events` table) map their rows into this.
 *
 *  - `key`   : the partition key (conv_id / user_id) — the GroupByKey routing key
 *              (/root/reference/parallel/data_parallel/GroupByKeyParallelExecutionAlgorithm.py:10-48).
 *  - `idx`   : per-key stable index (turn_idx / event_id) — replaces the reference's global
 *              arrival counter (/root/reference/base/Event.py:13-27); used for identity,
 *              dedup and contiguity policies.
 *  - `etype` : classified event type (/root/reference/base/DataFormatter.py:4-15).
 *  - `ts`    : event time in epoch micros.
 *  - `num`   : primary numeric payload attribute (price / value / text length ...).
 *  - `s1,s2` : string payload attributes (text, tool, props ...).
 *  - `prob`  : occurrence probability for probabilistic streams, or -1.0 when the stream is
 *              deterministic (/root/reference/base/Event.py:24-26).
 */
final case class Ev(
    key: String,
    idx: Long,
    etype: String,
    ts: Long,
    num: Double,
    s1: String,
    s2: String,
    prob: Double = -1.0)

/**
 * One bound pattern element inside a (partial) match: `slot` is the primitive position in the
 * pattern (the reference's event-definition index), `evs` has length 1 for plain bindings and
 * length >= 1 for Kleene-closure bindings (the reference's `AggregatedEvent`,
 * /root/reference/base/Event.py:47-64: min_timestamp = first element, max = last element).
 *
 * `aggId` (-1 for plain binds) reproduces a parity-defining identity quirk of the reference:
 * an AggregatedEvent's identity is `Event.counter` AT CREATION TIME — i.e. the serial of the
 * NEXT event to arrive — without incrementing it (/root/reference/base/Event.py:53-57).
 * Consequently (verified by executing the reference):
 *  (a) a Kleene aggregate collides with the next arriving event, so the duplicate-event check
 *      rejects matches pairing an aggregate with the event that arrived right after its
 *      newest member (e.g. SEQ(KC(A), B) over [A0, A1, B2] yields ONLY ([A0], B2));
 *  (b) the duplicate check never compares an aggregate's PRIMITIVE events, so the same
 *      primitive may appear both inside an aggregate and as a plain binding
 *      (SEQ(KC(A), A) over [A0] yields ([A0], A0)).
 * We mirror this with aggId = (idx of the event whose arrival created the aggregate) + 1,
 * exact whenever idx is the per-key arrival serial (transcripts' turn_idx; test streams).
 */
final case class Bind(slot: Int, name: String, evs: List[Ev], aggId: Long = -1L) {
  // cached: probed on every window/SEQ-order check of every candidate pair, and
  // `evs.last` walks the list (encoders/codec rebuild via the constructor, so the
  // cache always exists after deserialization)
  val minTs: Long = evs.head.ts
  val maxTs: Long = evs.last.ts
  def isKC: Boolean = aggId >= 0
}

/**
 * A partial match: binds kept sorted by slot. Mirrors the reference's `PatternMatch`
 * (/root/reference/base/PatternMatch.py:11-21) with first/last timestamps and joint
 * probability (-1.0 = deterministic). Timestamps computed once at construction — they are
 * probed on every expiry check and candidate-pair validation.
 */
final case class PM(binds: Vector[Bind], prob: Double = -1.0) {
  val firstTs: Long = { var m = Long.MaxValue; binds.foreach(b => if (b.minTs < m) m = b.minTs); m }
  val lastTs: Long = { var m = Long.MinValue; binds.foreach(b => if (b.maxTs > m) m = b.maxTs); m }
}

/** An emitted full match. `patternId` tags multi-pattern output (SURVEY.md §2.6). */
final case class CepMatch(
    key: String,
    patternId: Int,
    firstTs: Long,
    lastTs: Long,
    binds: Seq[Bind],
    prob: Double)

object Joint {
  /** Joint probability product; -1.0 encodes "deterministic" (reference: None),
    * /root/reference/misc/Utils.py:297-306. */
  def prob(a: Double, b: Double): Double =
    if (a < 0) b else if (b < 0) a else a * b
}
