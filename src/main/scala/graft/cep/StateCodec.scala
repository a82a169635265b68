package graft.cep

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable.ArrayBuffer

/**
 * Hand-rolled binary codec for streaming per-key state (reorder buffer + engine
 * snapshot). Replaces generic Kryo, which pays reflection plus per-object class-name
 * metadata on this graph (hundreds of small Ev/Bind/PM objects per key) — measured as the
 * dominant per-row cost of the streaming path. The codec:
 *  - deduplicates strings (conv keys, event types, slot names repeat constantly) and
 *    whole events (partial matches share their underlying events — a Kleene buffer holds
 *    the same Ev in many subsets) via back-reference tables;
 *  - writes fixed-width primitives for everything else — no reflection, no class names;
 *  - is versioned for checkpoint compatibility.
 * The byte array rides in the state store through the plain BINARY encoder, which also
 * keeps the stored row format engine-owned and stable across Spark upgrades.
 */
object StateCodec {

  final val Version = 3

  /** Mid-transition section of a simultaneous plan swap
    * (/root/reference/tree/evaluation/SimultaneousTreeBasedEvaluationMechanism.py:14-92):
    * the retiring plan's fingerprint and engine snapshot, the watermark when the
    * transition began, and the event time of the FIRST event fed to the new engine
    * (Long.MaxValue until one arrives) — the exact ownership boundary between the trees. */
  final case class OldPlan(fp: Int, startWm: Long, firstFedTs: Long, engine: EngineState)

  final case class Decoded(fp: Int, pending: Vector[Ev], engine: EngineState,
                           old: Option[OldPlan])

  def write(planFingerprint: Int, pendingEvents: Vector[Ev], engine: EngineState,
            old: Option[OldPlan] = None): Array[Byte] = {
    val bos = new ByteArrayOutputStream(512)
    val out = new DataOutputStream(bos)
    val strDict = new java.util.HashMap[String, Integer]()
    val evDict = new java.util.HashMap[Ev, Integer]()
    def ws(s: String): Unit =
      if (s == null) out.writeInt(-2)
      else {
        val i = strDict.get(s)
        if (i != null) out.writeInt(i.intValue())
        else { out.writeInt(-1); out.writeUTF(s); strDict.put(s, strDict.size()) }
      }
    def wEv(e: Ev): Unit = {
      val i = evDict.get(e)
      if (i != null) out.writeInt(i.intValue())
      else {
        out.writeInt(-1)
        ws(e.key); out.writeLong(e.idx); ws(e.etype); out.writeLong(e.ts)
        out.writeDouble(e.num); ws(e.s1); ws(e.s2); out.writeDouble(e.prob)
        evDict.put(e, evDict.size())
      }
    }
    def wBind(b: Bind): Unit = {
      out.writeInt(b.slot); ws(b.name)
      out.writeInt(b.evs.length); b.evs.foreach(wEv)
      out.writeLong(b.aggId)
    }
    def wPM(p: PM): Unit = {
      out.writeInt(p.binds.length); p.binds.foreach(wBind); out.writeDouble(p.prob)
    }
    def wEngine(e: EngineState): Unit = {
      out.writeInt(e.runtimes.length)
      e.runtimes.foreach { rt =>
        out.writeInt(rt.bufs.length)
        rt.bufs.foreach { b => out.writeInt(b.length); b.foreach(wPM) }
        out.writeInt(rt.pending.length); rt.pending.foreach(wPM)
        out.writeInt(rt.filtered.length)
        rt.filtered.foreach { case (id, fs) =>
          out.writeInt(id); out.writeInt(fs.length)
          fs.foreach { f => out.writeLong(f.idx); out.writeLong(f.minTs) }
        }
        out.writeInt(rt.freezers.length)
        rt.freezers.foreach { case (n, e) => ws(n); wEv(e) }
      }
    }
    out.writeByte(Version)
    out.writeInt(planFingerprint)
    out.writeInt(pendingEvents.length); pendingEvents.foreach(wEv)
    wEngine(engine)
    out.writeBoolean(old.isDefined)
    old.foreach { o =>
      out.writeInt(o.fp); out.writeLong(o.startWm); out.writeLong(o.firstFedTs)
      wEngine(o.engine)
    }
    out.flush()
    bos.toByteArray
  }

  def read(bytes: Array[Byte]): Decoded = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val strs = ArrayBuffer.empty[String]
    val evs = ArrayBuffer.empty[Ev]
    def rs(): String = in.readInt() match {
      case -2 => null
      case -1 => val s = in.readUTF(); strs += s; s
      case i  => strs(i)
    }
    def rEv(): Ev = in.readInt() match {
      case -1 =>
        val e = Ev(rs(), in.readLong(), rs(), in.readLong(), in.readDouble(), rs(), rs(),
          in.readDouble())
        evs += e; e
      case i => evs(i)
    }
    def rBind(): Bind = {
      val slot = in.readInt(); val name = rs()
      val n = in.readInt()
      val es = List.newBuilder[Ev]
      var i = 0
      while (i < n) { es += rEv(); i += 1 }
      Bind(slot, name, es.result(), in.readLong())
    }
    def rPM(): PM = {
      val n = in.readInt()
      val bs = Vector.newBuilder[Bind]
      var i = 0
      while (i < n) { bs += rBind(); i += 1 }
      PM(bs.result(), in.readDouble())
    }
    def rSeq[A](f: () => A): Vector[A] = {
      val n = in.readInt()
      val b = Vector.newBuilder[A]
      var i = 0
      while (i < n) { b += f(); i += 1 }
      b.result()
    }
    def rEngine(): EngineState = EngineState(rSeq { () =>
      RuntimeState(
        bufs = rSeq(() => rSeq(rPM)),
        pending = rSeq(rPM),
        filtered = rSeq(() => (in.readInt(), rSeq(() => FilteredEv(in.readLong(), in.readLong())))),
        freezers = rSeq(() => (rs(), rEv())))
    })
    val v = in.readByte()
    require(v == 2 || v == Version, s"unsupported state version $v")
    val fp = in.readInt()
    val pending = rSeq(rEv)
    val engine = rEngine()
    val old =
      if (v >= 3 && in.readBoolean())
        Some(OldPlan(in.readInt(), in.readLong(), in.readLong(), rEngine()))
      else None
    Decoded(fp, pending, engine, old)
  }
}
