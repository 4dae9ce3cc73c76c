package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Plan-constant byte blob for sketch-carrying expressions — the byte-array
  * sibling of [[DoubleMatrix]]: an OPAQUE holder so Catalyst plan renders /
  * AQE canonicalization never stringify or deep-compare a multi-megabyte
  * serialized sketch (hash-first content equality, short toString). The
  * blob rides in the stage's task binary, which Spark torrent-broadcasts
  * once per stage — not per task. */
final class BytesBlob(val bytes: Array[Byte]) extends Serializable {
  override lazy val hashCode: Int = java.util.Arrays.hashCode(bytes)
  override def equals(o: Any): Boolean = o match {
    case other: BytesBlob =>
      (this eq other) || (hashCode == other.hashCode &&
        java.util.Arrays.equals(bytes, other.bytes))
    case _ => false
  }
  override def toString: String =
    s"blob(${bytes.length}B#${Integer.toHexString(hashCode)})"
}

object BloomFunctions {

  /** `bloom might-contain` over a string column: true iff the UTF-8 bytes
    * of the value MIGHT be in the plan-shipped Spark
    * [[org.apache.spark.util.sketch.BloomFilter]] (serialized in `blob`).
    * False ⇒ definitively absent — the property the bloom-pruned exact
    * dedup leans on. Codegen'd (one readFrom per task via the transient
    * lazy, then O(numHashes) per row). */
  def mightContain(value: Column, blob: BytesBlob): Column =
    ColumnBridge.column(BloomMightContainExpr(ColumnBridge.expression(value), blob))
}

case class BloomMightContainExpr(child: Expression, blob: BytesBlob)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  @transient private lazy val bloom =
    org.apache.spark.util.sketch.BloomFilter.readFrom(blob.bytes)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects a string input, got $other")
    }

  def compute(s: UTF8String): Boolean = bloom.mightContainBinary(s.getBytes)

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bloomMc", this, classOf[BloomMightContainExpr].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $self.compute(($c));")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
