package graft.cep.spark

import graft.cep._
import graft.cep.PStruct._

/** Canonical transcript patterns shared by benchmarks and tests (SURVEY.md §7.2). */
object SparkPatterns {
  private val MIN = 60L * 1000000L

  /** SEQ(USER u, TOOL t, ASSISTANT a) WHERE len(a.text) > len(u.text) WITHIN 10 min. */
  val flagship: Pattern = Pattern(
    SEQ(P("USER", "u"), P("TOOL", "t"), P("ASSISTANT", "a")),
    CBinary("u", "a", (u, a) => a.num > u.num), 10 * MIN)

  /** SEQ(USER u, NOT(TOOL t), ASSISTANT a) WITHIN 5 min — answer with no tool call. */
  val negation: Pattern = Pattern(
    SEQ(P("USER", "u"), NOT(P("TOOL", "t")), P("ASSISTANT", "a")), CTrue, 5 * MIN)

  /** SEQ(USER u, KC(TOOL t)[1..3]) WITHIN 5 min — tool-call bursts after a user turn. */
  val kleene: Pattern = Pattern(
    SEQ(P("USER", "u"), KC(P("TOOL", "t"), min = 1, max = 3)), CTrue, 5 * MIN)

  /** The three patterns above — the parity-era bench workload. */
  val base: Seq[Pattern] =
    Seq(flagship.copy(id = 0), negation.copy(id = 1), kleene.copy(id = 2))

  /** Selective secondary patterns for the multi-pattern scaling workload: real CEP
    * deployments run MANY patterns over one stream, and these skew the per-turn cost
    * toward matching CPU (probe + condition evaluation) rather than match-output bytes —
    * equal-length echoes, off-by-one lengths, strictly-lengthening user triples. */
  val heavyExtras: Seq[Pattern] = Seq(
    Pattern(SEQ(P("USER", "u"), P("ASSISTANT", "a")),
      CBinary("u", "a", (x, y) => x.num == y.num), 10 * MIN, id = 3),
    Pattern(AND(P("USER", "u"), P("ASSISTANT", "a")),
      CBinary("u", "a", (x, y) => x.num + 1 == y.num), 10 * MIN, id = 4),
    Pattern(SEQ(P("USER", "u1"), P("USER", "u2"), P("USER", "u3")),
      Cond.all(CBinary("u1", "u2", (x, y) => y.num > x.num),
        CBinary("u2", "u3", (x, y) => y.num > x.num)), 15 * MIN, id = 5),
    Pattern(SEQ(P("SYSTEM", "s"), P("ASSISTANT", "a")),
      CBinary("s", "a", (x, y) => x.num == y.num), 10 * MIN, id = 6))

  /** base ++ heavyExtras — the scaling-series workload (7 jointly-evaluated patterns). */
  val heavy: Seq[Pattern] = base ++ heavyExtras
}
