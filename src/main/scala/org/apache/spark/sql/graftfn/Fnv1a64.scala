package org.apache.spark.sql.graftfn

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * FNV-1a 64-bit hash over a string's UTF-16 code units — the per-gram signature hash of
 * the dedup pipeline (graft.ops.Dedup). Replaces a per-row Scala UDF in the hottest stage
 * of MinHash/SimHash/n-gram signatures: a UDF forces a codegen break plus an
 * InternalRow->Row conversion per gram row; this expression folds the hash inside
 * WholeStageCodegen.
 *
 * Semantics note: hashing iterates CHARS (UTF-16 code units, `String.charAt`) to stay
 * bit-identical with the original Scala fold and the DuckDB oracle's `ord(gram[i])`
 * arithmetic — grams here are lowercase-alnum ASCII, where code unit == code point.
 * UTF8String stores UTF-8 bytes, so the codegen path converts to a JVM String first;
 * the conversion is still far cheaper than the UDF's full row round-trip.
 */
case class Fnv1a64(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "fnv1a64"

  override def nullSafeEval(input: Any): Any =
    Fnv1a64.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |java.lang.String $s = $c.toString();
         |long $h = 0xcbf29ce484222325L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $h ^= $s.charAt($i);
         |  $h *= 0x100000001b3L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Fnv1a64 {
  /** Shared JVM-side implementation (tests compare UDF-era hashes against this). */
  def hash(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }
}
