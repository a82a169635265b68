package org.apache.spark.sql.graftfn

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, LongType}

/**
 * Deterministic argmax aggregate for nearest-neighbor ranking: returns the `id` of the
 * row with the LARGEST `score`, ties broken to the SMALLEST `id` — exactly the
 * `row_number() over (order by score desc, id)` / `min(struct(-score, id))` pick, as a
 * 17-byte-buffer imperative aggregate.
 *
 * Why not `min(struct(...))`: a struct-typed aggregation buffer is not UnsafeRow-mutable,
 * so Spark falls back to SortAggregate — whose partial pass SORTS each task's candidate
 * stream before combining. For the similarity queries that stream is the O(n²) pair
 * block (graft.ops.Similarity), i.e. the partial aggregate would materialize (and at
 * 100 TB block sizes, spill) the very rows the aggregation exists to absorb. As a
 * TypedImperativeAggregate this runs under ObjectHashAggregateExec: hash-based partial
 * aggregation with one 17-byte buffer per group per task, pairs consumed as produced.
 *
 * Float semantics match the SQL ordering the oracle uses: -0.0 == 0.0 under the `==`/`>`
 * primitives (ties then break on id, as SQL's comparator does after float normalization);
 * NaN never wins (callers produce finite cosines — norms are strictly positive).
 */
case class NnTop1Agg(
    score: Expression,
    id: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[NnTop1Agg.Buf] with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "nn_top1"

  override def children: Seq[Expression] = Seq(score, id)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren.head, id = newChildren(1))
  override def withNewMutableAggBufferOffset(newOffset: Int): NnTop1Agg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): NnTop1Agg =
    copy(inputAggBufferOffset = newOffset)

  override def createAggregationBuffer(): NnTop1Agg.Buf = new NnTop1Agg.Buf()

  override def update(buf: NnTop1Agg.Buf, input: InternalRow): NnTop1Agg.Buf = {
    val s = score.eval(input)
    val n = id.eval(input)
    if (s != null && n != null) buf.offer(s.asInstanceOf[Double], n.asInstanceOf[Long])
    buf
  }

  override def merge(b1: NnTop1Agg.Buf, b2: NnTop1Agg.Buf): NnTop1Agg.Buf = {
    if (b2.set) b1.offer(b2.sim, b2.nn)
    b1
  }

  override def eval(buf: NnTop1Agg.Buf): Any = if (buf.set) buf.nn else null

  override def serialize(buf: NnTop1Agg.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(17)
    bb.putDouble(buf.sim); bb.putLong(buf.nn); bb.put(if (buf.set) 1.toByte else 0.toByte)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): NnTop1Agg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new NnTop1Agg.Buf()
    buf.sim = bb.getDouble(); buf.nn = bb.getLong(); buf.set = bb.get() == 1.toByte
    buf
  }
}

object NnTop1Agg {
  /** (best score, best id, seen-any) — mutated in place per group. */
  final class Buf(var sim: Double = Double.NegativeInfinity, var nn: Long = Long.MaxValue,
                  var set: Boolean = false) {
    def offer(s: Double, n: Long): Unit =
      if (!set || s > sim || (s == sim && n < nn)) { sim = s; nn = n; set = true }
  }
}
