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
}
