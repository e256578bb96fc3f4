package graft.functions

import org.apache.spark.SparkException
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Native sign-LSH bucket: for vector `v` and table index `t`, the
  * long whose bit b is set iff v · planes[t][b] ≥ 0 — the bucket key
  * every sign-random-hyperplane path shares
  * ([[graft.ann.Ann.lshNeighborsPlanes]], the persisted cosine index
  * and its batch probes in [[graft.dedup.Dedup]]).
  *
  * The composed form — an aggregate-over-bits HOF fold with the plane
  * tensor as a nested array literal — paid an interpreted lambda
  * dispatch plus two levels of literal element_at per (row, table,
  * bit): with the corpus-adaptive width that is tables × up-to-48 bits
  * of dispatch per corpus row, the dominant map-side term of the
  * cosine index build. Here: one monomorphic double loop per (row,
  * table), the tensor shipped once as a reference object.
  *
  * Parity with the fold is exact, bit for bit: the sign test is the
  * same `d ≥ 0` on the same index-order dot (NaN sets no bit), and the
  * fold's null plumbing — a null vector, a null element anywhere in
  * it, or a vector/plane length mismatch nulls every dot, landing the
  * row in bucket 0 — is replicated by the up-front scan below (the
  * callers' "mismatch lands everything in bucket 0" comments describe
  * exactly this). A null table index (never produced — tables come
  * from an explode over a bounded sequence) also buckets 0, like the
  * fold's null-poisoned tensor lookup; an out-of-range table RAISES
  * like ANSI element_at did. Output is non-nullable — bucket keys
  * join, and a null key would silently drop rows.
  */
case class SignLshBucket(left: Expression, right: Expression,
    tensor: Seq[Seq[Seq[Double]]]) extends BinaryExpression {

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    if (tensor.isEmpty || tensor.exists(_.isEmpty))
      return TypeCheckResult.TypeCheckFailure(
        "graft_sign_bucket: empty plane tensor")
    if (tensor.exists(_.size != tensor.head.size) ||
      tensor.exists(_.exists(_.size != tensor.head.head.size)))
      return TypeCheckResult.TypeCheckFailure(
        "graft_sign_bucket: ragged plane tensor")
    if (tensor.head.size > 63)
      return TypeCheckResult.TypeCheckFailure(
        s"graft_sign_bucket: ${tensor.head.size} bits per table " +
          "overflows a long bucket")
    left.dataType match {
      case ArrayType(DoubleType, _) =>
        if (right.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"graft_sign_bucket requires an int table index, got ${right.dataType}")
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_sign_bucket requires an array<double> vector, got $t")
    }
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sign_bucket"

  @transient private lazy val packed: SignLshBucket.Packed = {
    val tables = tensor.size
    val bits = tensor.head.size
    val dim = tensor.head.head.size
    val flat = new Array[Double](tables * bits * dim)
    var t = 0
    while (t < tables) {
      var b = 0
      while (b < bits) {
        var j = 0
        while (j < dim) {
          flat((t * bits + b) * dim + j) = tensor(t)(b)(j)
          j += 1
        }
        b += 1
      }
      t += 1
    }
    SignLshBucket.Packed(flat, tables, bits, dim)
  }

  override def eval(input: InternalRow): Any = {
    val v = left.eval(input)
    val t = right.eval(input)
    SignLshBucket.bucket(
      if (v == null) null else v.asInstanceOf[ArrayData],
      if (t == null) -1 else t.asInstanceOf[Int],
      packed)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val packedRef = ctx.addReferenceObj("lshPlanes", packed,
      classOf[SignLshBucket.Packed].getName)
    ev.copy(code = code"""
      ${leftGen.code}
      ${rightGen.code}
      long ${ev.value} = graft.functions.SignLshBucket.bucket(
        ${leftGen.isNull} ? null : ${leftGen.value},
        ${rightGen.isNull} ? -1 : ${rightGen.value}, $packedRef);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SignLshBucket =
    copy(left = newLeft, right = newRight)
}

object SignLshBucket {

  /** Driver-packed plane tensor shipped as one reference object. */
  case class Packed(flat: Array[Double], tables: Int, bits: Int, dim: Int)
    extends Serializable

  def bucket(v: ArrayData, table: Int, p: Packed): Long = {
    // only −1 is legal below 0: it is the INTERNAL null-table sentinel
    // the eval/codegen paths substitute for a null index. A genuinely
    // negative index must raise — ANSI element_at would have read from
    // the END of the tensor for it, so silently aliasing to bucket 0
    // would be a semantic divergence a reuse site could never see
    if (table >= p.tables || table < -1)
      throw new SparkException(
        s"graft_sign_bucket: table $table outside the ${p.tables}-table tensor")
    // the fold's null plumbing: null vector / null table lookup /
    // length mismatch / null element → every dot null → bucket 0
    if (v == null || table == -1 || v.numElements() != p.dim) return 0L
    var j = 0
    while (j < p.dim) {
      if (v.isNullAt(j)) return 0L
      j += 1
    }
    var bucket = 0L
    val tBase = table * p.bits * p.dim
    var b = 0
    while (b < p.bits) {
      var acc = 0.0
      val base = tBase + b * p.dim
      var i = 0
      while (i < p.dim) {
        acc += v.getDouble(i) * p.flat(base + i)
        i += 1
      }
      if (acc >= 0.0) bucket |= 1L << b
      b += 1
    }
    bucket
  }

  /** DataFrame-API entry point: bucket of `vec` in table `tableIdx` of
    * the driver-held `tensor` [table][bit][dim].
    */
  def ofColumns(vec: Column, tableIdx: Column,
      tensor: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(SignLshBucket(ColumnBridge.expression(vec),
      ColumnBridge.expression(tableIdx), tensor))
}
