package graft.cep.spark

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import graft.cep._

/**
 * HyperCube data-parallel execution for patterns WITHOUT a usable partition key
 * (/root/reference/parallel/data_parallel/HyperCubeParallelExecutionAlgorithm.py:54-113)
 * — the execution story the key-grouped paths cannot cover: a cross-conversation pattern
 * would otherwise collapse onto a single task.
 *
 * Each (event type, attribute) pair is assigned one dimension of a task cube whose shape
 * is the most-equal factorization of the unit budget (`calcCubicShares`, reference
 * `:80-103`). An event of a mapped type is replicated to the UNION of the cube faces
 * fixing each of its attribute hashes (reference `_classifier`, `:54-78`); events of
 * unmapped types broadcast to every cell. Any candidate match therefore co-locates in at
 * least one cell; a match is kept only by the MINIMUM cell of the intersection of its
 * members' cell sets (reference `skip_item`, `:105-113`), so each match is emitted
 * exactly once.
 *
 * Like the reference, a pattern may not bind the same event type twice (two same-type
 * members with different attribute hashes would never co-locate).
 */
object HyperCube {

  /** Most-equal cube factorization: start from floor(units^(1/dims)) per dim and grow
    * greedily while the product stays within budget (reference `_calc_cubic_shares`). */
  def calcCubicShares(units: Int, dims: Int): Array[Int] = {
    require(units >= 1 && dims >= 1)
    val shares = Array.fill(dims)(math.max(1, math.floor(math.pow(units, 1.0 / dims)).toInt))
    var changed = true
    while (changed) {
      changed = false
      var i = 0
      while (i < dims) {
        val used = shares.product
        if (used / shares(i) * (shares(i) + 1) <= units) { shares(i) += 1; changed = true }
        i += 1
      }
    }
    shares
  }

  /** Cube geometry: `dims(i)` = (event type, attribute extractor) of dimension i. */
  private final case class Cube(shape: Array[Int], dims: Array[(String, Ev => Long)])
    extends Serializable {
    val size: Int = shape.product
    /** stride of each dimension in the linearized cell index */
    val strides: Array[Int] = {
      val s = new Array[Int](shape.length)
      var acc = 1
      var i = shape.length - 1
      while (i >= 0) { s(i) = acc; acc *= shape(i); i -= 1 }
      s
    }
    private val dimsByType: Map[String, Array[Int]] =
      dims.indices.groupBy(i => dims(i)._1).map { case (t, is) => t -> is.toArray }
    private val typeIndex: Map[String, Int] = dimsByType.keys.toArray.sorted.zipWithIndex.toMap

    @transient private lazy val allCells: Array[Int] = (0 until size).toArray
    /** (type, coordinate-vector) -> sorted cell array. The domain is tiny and closed —
      * at most |types| * product(shape) <= |types| * units distinct entries — while the
      * same lookup runs once per EVENT in the replication flatMap and once per match
      * MEMBER in the owner filter; recomputing the face union there dominated the whole
      * query (round-3 driver artifact: 4.5 s where ~1 s is the real work). Keys are exact
      * mixed-radix encodings (typeIdx, then each mapped dim's coordinate), so no
      * collisions; one cache instance lives per deserialized Cube (per task). */
    @transient private lazy val cellCache =
      new java.util.concurrent.ConcurrentHashMap[java.lang.Long, Array[Int]]()

    /** Cells of the face fixing dimension `d` at coordinate `c`. */
    private def face(d: Int, c: Int): Iterator[Int] =
      (0 until size).iterator.filter(u => (u / strides(d)) % shape(d) == c)

    /** Cells an event routes to (union of its attribute faces; all cells if unmapped) —
      * sorted ascending, shared via [[cellCache]]; callers must not mutate. */
    def cells(e: Ev): Array[Int] = dimsByType.get(e.etype) match {
      case None => allCells
      case Some(ds) =>
        // typeIndex * (size+1) + mixed-radix coords: coords < product(shapes) <= size,
        // so keys from different types can never collide
        var key: Long = 0L
        var i = 0
        while (i < ds.length) {
          val d = ds(i)
          key = key * shape(d) + math.floorMod(dims(d)._2(e), shape(d).toLong)
          i += 1
        }
        key += typeIndex(e.etype).toLong * (size + 1L)
        var arr = cellCache.get(key)
        if (arr == null) {
          arr = ds.iterator.flatMap { d =>
            val c = (math.floorMod(dims(d)._2(e), shape(d).toLong)).toInt
            face(d, c)
          }.toArray.distinct.sorted
          cellCache.put(key, arr)
        }
        arr
    }

    /** Minimum of the intersection of the members' cell sets (all arrays sorted) — the
      * owner cell of a match (reference skip_item). -1 if the intersection is empty
      * (cannot happen for a real match: its members co-located in the current cell). */
    def minCommonCell(cellSets: Array[Array[Int]]): Int = {
      val first = cellSets(0)
      var i = 0
      while (i < first.length) {
        val v = first(i)
        var j = 1
        var inAll = true
        while (inAll && j < cellSets.length) {
          if (java.util.Arrays.binarySearch(cellSets(j), v) < 0) inAll = false
          j += 1
        }
        if (inAll) return v
        i += 1
      }
      -1
    }
  }

  /**
   * Evaluate key-less patterns over the whole stream. `attributes` maps an event type to
   * the numeric attribute extractors that become cube dimensions (the reference's
   * `attributes_dict`); `units` defaults to the session's parallelism.
   */
  def evaluate(events: Dataset[Ev], patterns: Seq[Pattern],
               attributes: Map[String, Seq[Ev => Long]],
               units: Int = 0): Dataset[CepMatch] = {
    require(attributes.nonEmpty, "attributes_dict is empty")
    patterns.foreach { p =>
      val types = primitiveTypes(p.structure)
      require(types.distinct.lengthCompare(types.length) == 0,
        s"HyperCube does not support multiple bindings of one event type, got $types")
      // a Kleene subset binds many events of one type with different attribute hashes —
      // they would never co-locate; such types must broadcast
      val kcTypes = kcPrimitiveTypes(p.structure)
      require(kcTypes.forall(t => !attributes.contains(t)),
        s"Kleene-bound types must stay unmapped (broadcast), got mapped: ${kcTypes.filter(attributes.contains)}")
      // a negative routed by attribute reaches only its own faces, so the owner cell of
      // a match may never see the invalidating negative -> silent false positives;
      // negative types must stay unmapped (broadcast to every cell)
      val negTypes = negPrimitiveTypes(p.structure)
      require(negTypes.forall(t => !attributes.contains(t)),
        s"negated types must stay unmapped (broadcast), got mapped: ${negTypes.filter(attributes.contains)}")
    }
    val spark = events.sparkSession
    import spark.implicits._
    val nUnits = if (units > 0) units else spark.sparkContext.defaultParallelism
    val dims: Array[(String, Ev => Long)] =
      attributes.toArray.sortBy(_._1).flatMap { case (t, fs) => fs.map(f => (t, f)) }
    val cube = Cube(calcCubicShares(nUnits, dims.length), dims)
    val compiled = patterns.flatMap(Compiler.compile).toIndexedSeq
    val types = compiled.flatMap(_.relevantTypes).distinct

    // Cell routing needs the user-supplied attribute extractors (arbitrary closures), so
    // the replication step stays a typed flatMap; the SHUFFLE and per-cell evaluation are
    // row-based like BatchEvaluator/Rip — Tungsten-sorted rows streamed through the
    // engine at unit boundaries, events materialized once on the reduce side.
    events
      .filter(col("etype").isin(types: _*))
      .flatMap(e => cube.cells(e).iterator.map(u => (u, e)))
      .toDF()
      .select((col("_1").as("unit") +: BatchEvaluator.EvCols.map(c => col(s"_2.$c"))): _*)
      .repartition(col("unit"))
      .sortWithinPartitions("unit", "ts", "idx")
      .mapPartitions { rows =>
        new Iterator[CepMatch] {
          private var curUnit = Int.MinValue
          private var engine: MatchEngine = null
          private val buf = scala.collection.mutable.Queue.empty[CepMatch]
          // owner rule: keep only matches whose members' cell-set intersection has this
          // unit as its minimum (reference skip_item); cell sets come from the cube's
          // per-task cache, so the filter costs a few sorted-array probes per match
          private val ownSink = (m: CepMatch) => {
            val memberCells = m.binds.iterator.flatMap(_.evs).map(cube.cells).toArray
            if (cube.minCommonCell(memberCells) == curUnit) { buf += m; () }
          }
          private def rowToEv(r: org.apache.spark.sql.Row): Ev =
            Ev(r.getString(1), r.getLong(2), r.getString(3), r.getLong(4), r.getDouble(5),
              r.getString(6), r.getString(7), r.getDouble(8))
          private def finishEngine(): Unit = {
            engine.finish().foreach(ownSink)
            engine = null
          }
          private def refill(): Unit = {
            while (buf.isEmpty && rows.hasNext) {
              val r = rows.next()
              val u = r.getInt(0)
              if (u != curUnit || engine == null) {
                if (engine != null) finishEngine()
                curUnit = u
                engine = new MatchEngine(compiled)
              }
              engine.feedEach(rowToEv(r))(ownSink)
            }
            if (buf.isEmpty && engine != null) finishEngine()
          }
          def hasNext: Boolean = { refill(); buf.nonEmpty }
          def next(): CepMatch = { refill(); buf.dequeue() }
        }
      }
  }

  private def negPrimitiveTypes(s: PStruct): List[String] = s match {
    case PNeg(a)          => primitiveTypes(a)
    case PSeq(as)         => as.flatMap(negPrimitiveTypes)
    case PAnd(as)         => as.flatMap(negPrimitiveTypes)
    case POr(as)          => as.flatMap(negPrimitiveTypes)
    case PKleene(a, _, _) => negPrimitiveTypes(a)
    case _: Prim          => Nil
  }

  private def kcPrimitiveTypes(s: PStruct): List[String] = s match {
    case PKleene(a, _, _) => primitiveTypes(a)
    case PSeq(as)         => as.flatMap(kcPrimitiveTypes)
    case PAnd(as)         => as.flatMap(kcPrimitiveTypes)
    case POr(as)          => as.flatMap(kcPrimitiveTypes)
    case PNeg(a)          => kcPrimitiveTypes(a)
    case _: Prim          => Nil
  }

  private def primitiveTypes(s: PStruct): List[String] = s match {
    case Prim(et, _)      => List(et)
    case PSeq(as)         => as.flatMap(primitiveTypes)
    case PAnd(as)         => as.flatMap(primitiveTypes)
    case POr(as)          => as.flatMap(primitiveTypes)
    case PKleene(a, _, _) => primitiveTypes(a)
    case PNeg(a)          => primitiveTypes(a)
  }
}
