package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `might_contain(key)` against a FIXED, pre-built bloom filter — the
  * probe side of semi-join pruning (see [[graft.ops.BloomPrune]]).
  * Spark's own runtime bloom filters exist only as internal expressions
  * the optimizer injects; this surfaces the same capability as an
  * explicit, codegen'd operator the pipeline author controls.
  *
  * The expression tree carries the SERIALIZED filter (plain bytes, so
  * the plan ships to executors unconditionally); the filter object
  * deserializes once per JVM via the lazy val / codegen reference
  * object, and each row is one `mightContainLong`/`String`/`Binary`
  * probe inside whole-stage codegen. False positives pass (the
  * downstream exact join removes them); false negatives cannot occur.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
  extends UnaryExpression {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  // Array[Byte] equals/hashCode are reference-based, which would make two
  // semantically identical probes never compare equal — defeating
  // Catalyst semanticEquals / common-subexpression elimination. Compare
  // the filter by VALUE.
  override def equals(other: Any): Boolean = other match {
    case b: BloomMightContain =>
      child == b.child && java.util.Arrays.equals(bloomBytes, b.bloomBytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bloomBytes)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType | StringType | BinaryType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain does not support $t keys")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case LongType => bloom.mightContainLong(input.asInstanceOf[Long])
    case IntegerType => bloom.mightContainLong(input.asInstanceOf[Int].toLong)
    case ShortType => bloom.mightContainLong(input.asInstanceOf[Short].toLong)
    case ByteType => bloom.mightContainLong(input.asInstanceOf[Byte].toLong)
    case StringType => bloom.mightContainString(input.asInstanceOf[UTF8String].toString)
    case BinaryType => bloom.mightContainBinary(input.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => child.dataType match {
      case LongType => s"${ev.value} = $ref.mightContainLong($c);"
      case IntegerType | ShortType | ByteType =>
        s"${ev.value} = $ref.mightContainLong((long) $c);"
      case StringType => s"${ev.value} = $ref.mightContainString($c.toString());"
      case BinaryType => s"${ev.value} = $ref.mightContainBinary($c);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  /** DataFrame-API entry point. */
  def ofColumn(key: Column, bloom: BloomFilter): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    ColumnBridge.column(
      BloomMightContain(ColumnBridge.expression(key), bos.toByteArray))
  }
}
