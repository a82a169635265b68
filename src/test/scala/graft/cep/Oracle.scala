package graft.cep

import scala.collection.mutable

/**
 * Brute-force, declarative pattern matcher — the test oracle. An independent
 * reimplementation of the reference's generate_matches semantics
 * (/root/reference/misc/Utils.py:175-215), extended to Kleene closure and negation:
 * enumerate every assignment of events to pattern slots and keep those satisfying the
 * inclusive window, the tie-tolerant SEQ slot order, all conditions, and the
 * no-qualifying-negative rule. Exponential by design; used on tiny streams only.
 *
 * Restrictions (fine for the parity suite): KC only over a primitive; negation only at the
 * top level (same as the engine); policies/probability are not modeled (MATCH_ANY only).
 */
object Oracle {

  /** Canonical match form: slot -> event idx list, per key. */
  type OMatch = List[(Int, List[Long])]

  def matches(p: Pattern, events: Seq[Ev]): Set[(String, OMatch)] =
    events.groupBy(_.key).iterator.flatMap { case (key, evs) =>
      matchesOneKey(p, evs.sortBy(e => (e.ts, e.idx))).map(key -> _)
    }.toSet

  private case class SlotSpec(slot: Int, name: String, etype: String,
                              kc: Boolean, kcMin: Int, kcMax: Int, negative: Boolean, unboundedNeg: Boolean)

  private def matchesOneKey(p: Pattern, evs: Seq[Ev]): Set[OMatch] = {
    Compiler.expandOr(p.structure).flatMap(alt => matchesAlt(p, alt, evs)).toSet
  }

  private def matchesAlt(p: Pattern, structure: PStruct, evs: Seq[Ev]): Set[OMatch] = {
    // slot assignment: DFS, negatives in place
    var next = -1
    val slots = mutable.ArrayBuffer.empty[SlotSpec]
    val seqGroups = mutable.ArrayBuffer.empty[Array[Int]] // per PSeq: covered slots (sorted)

    def walk(s: PStruct, negative: Boolean, unbounded: Boolean): Array[Int] = s match {
      case Prim(et, n) =>
        next += 1; slots += SlotSpec(next, n, et, kc = false, 1, 0, negative, unbounded)
        Array(next)
      case PKleene(Prim(et, n), mn, mx) =>
        next += 1; slots += SlotSpec(next, n, et, kc = true, mn, mx, negative, unbounded)
        Array(next)
      case PKleene(_, _, _) => throw new IllegalArgumentException("oracle: KC over composite unsupported")
      case PSeq(as) =>
        val covered = as.flatMap {
          case PNeg(inner) =>
            // bounded iff a positive arg follows (computed by caller only at top level)
            walk(inner, negative = true, unbounded = false).toList
          case a => walk(a, negative, unbounded).toList
        }.toArray.sorted
        seqGroups += covered
        covered
      case PAnd(as) =>
        as.flatMap {
          case PNeg(inner) => walk(inner, negative = true, unbounded = true).toList
          case a           => walk(a, negative, unbounded).toList
        }.toArray.sorted
      case PNeg(_) => throw new IllegalArgumentException("oracle: nested negation unsupported")
      case POr(_)  => throw new IllegalStateException("OR expanded earlier")
    }
    // fix up unbounded flags for top-level SEQ negatives
    val topArgs = structure match { case PSeq(a) => a; case PAnd(a) => a; case s => List(s) }
    walk(structure, negative = false, unbounded = false)
    // recompute unbounded for SEQ-top negatives: unbounded iff no positive arg after
    if (structure.isInstanceOf[PSeq]) {
      val lastPos = topArgs.lastIndexWhere(!_.isInstanceOf[PNeg])
      var slotCursor = 0
      topArgs.zipWithIndex.foreach { case (arg, argIdx) =>
        val width = arg.names.length
        if (arg.isInstanceOf[PNeg] && argIdx > lastPos) {
          (slotCursor until slotCursor + width).foreach { s =>
            val i = slots.indexWhere(_.slot == s)
            slots(i) = slots(i).copy(unboundedNeg = true)
          }
        }
        slotCursor += width
      }
    } else if (structure.isInstanceOf[PAnd]) {
      slots.indices.foreach(i => if (slots(i).negative) slots(i) = slots(i).copy(unboundedNeg = true))
    }

    val posSlots = slots.filter(!_.negative).sortBy(_.slot).toList
    val negSlots = slots.filter(_.negative).toList
    val posNames = posSlots.map(_.name).toSet
    val conjuncts = (p.condition.conjuncts ++ contiguityConds(p)).filter(_.names.nonEmpty)
    val posConds = conjuncts.filter(_.names.subsetOf(posNames))
    implicit val tupOrd: Ordering[(Long, Long)] = Ordering.Tuple2[Long, Long]
    val feedOrd: Ev => (Long, Long) = e => (e.ts, e.idx)

    val byType = evs.groupBy(_.etype).withDefaultValue(Seq.empty)
    val results = mutable.Set.empty[OMatch]

    def orderedSubsets(xs: Seq[Ev], mn: Int, mx: Int): Iterator[List[Ev]] = {
      val max = if (mx > 0) math.min(mx, xs.length) else xs.length
      (mn to max).iterator.flatMap(k => xs.combinations(k)).map(_.toList)
    }

    def seqOk(binds: Map[Int, List[Ev]]): Boolean =
      seqGroups.forall { group =>
        val present = group.filter(binds.contains).map(s => (binds(s).head.ts, binds(s).last.ts))
        present.sliding(2).forall {
          case Array((min1, max1), (min2, max2)) => min1 <= min2 && max1 <= max2
          case _                                 => true
        }
      }

    def windowOk(binds: Map[Int, List[Ev]]): Boolean = {
      val all = binds.values.flatten
      all.map(_.ts).max - all.map(_.ts).min <= p.windowMicros
    }

    /** Identity model mirroring the reference (see Bind.aggId scaladoc): plain slots
      * contribute their event serials; a KC slot contributes ONLY its aggregate identity =
      * (idx of its newest-by-feed-order member) + 1. */
    val kcSlotSet = slots.filter(_.kc).map(_.slot).toSet
    def distinctOk(binds: Map[Int, List[Ev]]): Boolean = {
      val ids = binds.iterator.flatMap { case (s, l) =>
        if (kcSlotSet(s)) Iterator.single(l.map(e => (e.ts, e.idx)).max._2 + 1)
        else l.iterator.map(_.idx)
      }.toList
      ids.distinct.length == ids.length
    }

    def binding(binds: Map[Int, List[Ev]]): Map[String, List[Ev]] =
      binds.map { case (s, l) => slots.find(_.slot == s).get.name -> l }

    def tryComplete(binds: Map[Int, List[Ev]]): Unit = {
      val bnd = binding(binds)
      if (!posConds.forall(_.eval(bnd))) return
      // negation: no qualifying negative event
      val matchEvents = binds.values.flatten.toList
      val lastFeed = matchEvents.map(feedOrd).max
      val invalid = negSlots.exists { ns =>
        val crossConds = conjuncts.filter(c =>
          c.names.contains(ns.name) && c.names.subsetOf(posNames + ns.name))
        byType(ns.etype).exists { b =>
          (ns.unboundedNeg || tupOrd.lt(feedOrd(b), lastFeed)) && {
            val merged = binds + (ns.slot -> List(b))
            // distinctOk applies the reference's identity model: a negative whose serial
            // collides with a match event (or an aggregate's identity) fails the merged
            // duplicate check and therefore cannot invalidate
            windowOk(merged) && seqOk(merged) && distinctOk(merged) &&
              crossConds.forall(_.eval(binding(merged)))
          }
        }
      }
      if (!invalid)
        results += binds.toList.sortBy(_._1).map { case (s, l) => (s, l.map(_.idx)) }
    }

    def assign(rem: List[SlotSpec], binds: Map[Int, List[Ev]]): Unit = rem match {
      case Nil => tryComplete(binds)
      case ss :: rest =>
        val leafConds = conjuncts.filter(c => !c.isKC && c.names == Set(ss.name))
        val kcConds = conjuncts.filter(c => c.isKC && c.names == Set(ss.name))
        val candidates = byType(ss.etype)
        if (ss.kc) {
          orderedSubsets(candidates.filter(e => leafConds.forall(_.eval(Map(ss.name -> List(e))))),
            ss.kcMin, ss.kcMax).foreach { sub =>
            val merged = binds + (ss.slot -> sub)
            if (windowOk(merged) && distinctOk(merged) && seqOk(merged) &&
              kcConds.forall(_.eval(Map(ss.name -> sub))))
              assign(rest, merged)
          }
        } else {
          candidates.foreach { e =>
            if (leafConds.forall(_.eval(Map(ss.name -> List(e))))) {
              val merged = binds + (ss.slot -> List(e))
              if (windowOk(merged) && distinctOk(merged) && seqOk(merged)) assign(rest, merged)
            }
          }
        }
    }

    assign(posSlots, Map.empty)
    results.toSet
  }

  private def contiguityConds(p: Pattern): List[Cond] =
    p.policy.contiguous.flatMap(_.sliding(2).collect {
      case List(a, b) => CBinary(a, b, (x: Ev, y: Ev) => y.idx == x.idx + 1): Cond
    })

  /** Canonicalize engine output for comparison against the oracle. */
  def canon(ms: Seq[CepMatch]): Set[(String, OMatch)] =
    ms.map(m => m.key -> m.binds.toList.sortBy(_.slot).map(b => (b.slot, b.evs.map(_.idx)))).toSet
}
