package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{LeafExpression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `ulid_string()` — time-ordered unique identifier (ULID spec: 48-bit
  * millisecond timestamp + 80-bit randomness, Crockford base32, 26 chars).
  * Reference exposes the same as a native function; implemented here as a
  * nondeterministic leaf expression seeded per partition (no UDF
  * registration, usable in any column position). Lexicographic order of the
  * ids follows generation time at millisecond granularity. */
object UlidExpression {
  def ulidString(): Column = ColumnBridge.column(UlidExpr())

  private val Alphabet = "0123456789ABCDEFGHJKMNPQRSTVWXYZ".toCharArray

  def generate(rnd: java.util.Random): UTF8String = {
    val out = new Array[Char](26)
    var t = System.currentTimeMillis()
    var i = 9
    while (i >= 0) { out(i) = Alphabet((t & 31).toInt); t >>>= 5; i -= 1 }
    var j = 10
    while (j < 26) {
      // 5 random bits per char; Random.nextInt is cheap enough at row rate
      out(j) = Alphabet(rnd.nextInt(32))
      j += 1
    }
    UTF8String.fromString(new String(out))
  }
}

case class UlidExpr() extends LeafExpression with Nondeterministic with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def stateful: Boolean = true

  @transient private var rnd: java.util.Random = _

  override protected def initializeInternal(partitionIndex: Int): Unit =
    rnd = new java.util.Random(System.nanoTime() ^ (partitionIndex.toLong << 32))

  override protected def evalInternal(input: InternalRow): Any =
    UlidExpression.generate(rnd)
}
