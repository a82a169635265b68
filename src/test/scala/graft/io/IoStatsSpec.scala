package graft.io

import org.scalatest.funsuite.AnyFunSuite
import graft.cep.spark.{SparkT, Stats}

class IoStatsSpec extends AnyFunSuite {
  import SparkT.spark

  test("CSV round-trip preserves transcripts byte-for-byte (per-turn text equality)") {
    val turns = Transcripts.generate(nConvs = 5)
    val ds = Transcripts.toDs(spark, turns)
    val dir = java.nio.file.Files.createTempDirectory("graftcsv").toString + "/t"
    TranscriptsCsv.write(ds, dir)
    val back = TranscriptsCsv.read(spark, dir).collect()
    def canon(ts: Seq[Transcripts.Turn]) =
      ts.sortBy(t => (t.conv_id, t.turn_idx)).map(t =>
        (t.conv_id, t.turn_idx, t.role, t.text, Option(t.tool), t.ts.getTime))
    assert(canon(back.toSeq) == canon(turns))
  }

  test("legacy CSV layout is sniffed from the header and mapped to the canonical schema") {
    val turns = Transcripts.generate(nConvs = 5)
    val ds = Transcripts.toDs(spark, turns)
    val dir = java.nio.file.Files.createTempDirectory("graftcsvlegacy").toString + "/t"
    TranscriptsCsv.writeLegacy(ds, dir)
    val back = TranscriptsCsv.read(spark, dir).collect() // same read() entry point: sniffed
    def canon(ts: Seq[Transcripts.Turn]) =
      ts.sortBy(t => (t.conv_id, t.turn_idx)).map(t =>
        (t.conv_id, t.turn_idx, t.role, t.text, Option(t.tool), t.ts.getTime))
    assert(canon(back.toSeq) == canon(turns))
  }

  test("arrival rates: windowed per-type counts sum to the input size") {
    val evs = Transcripts.toEv(Transcripts.toDs(spark, Transcripts.generate(nConvs = 10)))
    val rates = Stats.arrivalRates(evs, "10 minutes").collect()
    assert(rates.map(_.getLong(2)).sum == evs.count())
    assert(rates.map(_.getString(0)).toSet.subsetOf(Set("USER", "TOOL", "ASSISTANT", "SYSTEM")))
  }

  test("selectivity: fraction of long texts per type in [0, 1] with exact counts") {
    val evs = Transcripts.toEv(Transcripts.toDs(spark, Transcripts.generate(nConvs = 10)))
    val sel = Stats.selectivity(evs, _.num > 60).collect()
    sel.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2))
      val s = r.getDouble(3)
      assert(s >= 0.0 && s <= 1.0)
    }
    assert(sel.map(_.getLong(2)).sum == evs.count())
  }
}
