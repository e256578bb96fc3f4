package graft.functions

import org.apache.spark.SparkException
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Driver-packed dense cell-mean matrix (cells × dim) shared by the
  * residual-PQ expressions below — shipped once as a reference object,
  * like [[PqAssignCodes.Packed]].
  */
case class MeansPacked(flat: Array[Double], cells: Int, dim: Int)
  extends Serializable

object MeansPacked {
  def pack(means: Seq[Seq[Double]]): MeansPacked = {
    val cells = means.size
    val dim = if (cells == 0) 0 else means.head.size
    require(means.forall(_.size == dim), "ragged cell-mean matrix")
    val flat = new Array[Double](cells * dim)
    var c = 0
    while (c < cells) {
      var j = 0
      while (j < dim) { flat(c * dim + j) = means(c)(j); j += 1 }
      c += 1
    }
    MeansPacked(flat, cells, dim)
  }
}

/** Native residual-PQ code assignment: codes[s] = argmin_c
  * ‖(v − μ(cluster))_s − cb_s_c‖² — [[PqAssignCodes]] with the cell
  * mean subtracted on the fly, so the IVF-PQ encode pass never
  * materializes a residual array per row (the composed form built
  * `res = zip_with(v, mean, _-_)` — d interpreted dispatches and one
  * allocation per row — just to feed the argmin).
  *
  * Arithmetic parity with subtract-then-assign is exact: the residual
  * coordinate is the same `v[j] − mean[j]` double op, consumed by the
  * same index-order dot and the same strict-< argmin
  * ([[PqAssignCodes]] semantics; IvfPqSpec and the ivfpq fixture
  * oracle pin the end-to-end path). A null vector or null cluster
  * yields a null row; a null element yields −1 for its subspace
  * (the fold outcome); an out-of-range cluster or a dim mismatch
  * RAISES (ANSI element_at raised there too).
  */
case class PqResidualAssignCodes(left: Expression, right: Expression,
    means: Seq[Seq[Double]], books: Seq[Seq[Seq[Double]]])
    extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    if (books.isEmpty || books.exists(_.isEmpty) ||
      books.exists(_.exists(_.isEmpty)))
      return TypeCheckResult.TypeCheckFailure(
        "graft_pq_res_assign: empty codebook")
    if (means.isEmpty)
      return TypeCheckResult.TypeCheckFailure(
        "graft_pq_res_assign: empty cell-mean matrix")
    left.dataType match {
      case ArrayType(DoubleType, _) =>
        if (right.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"graft_pq_res_assign requires an int cluster, got ${right.dataType}")
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_res_assign requires an array<double> vector, got $t")
    }
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_res_assign"

  @transient private lazy val packedBooks: PqAssignCodes.Packed =
    PqAssignCodes.pack(books)
  @transient private lazy val packedMeans: MeansPacked = MeansPacked.pack(means)

  override protected def nullSafeEval(vec: Any, cluster: Any): Any =
    PqResidualAssignCodes.assign(vec.asInstanceOf[ArrayData],
      cluster.asInstanceOf[Int], packedMeans, packedBooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqResBooks", packedBooks,
      classOf[PqAssignCodes.Packed].getName)
    val meansRef = ctx.addReferenceObj("pqResMeans", packedMeans,
      classOf[MeansPacked].getName)
    nullSafeCodeGen(ctx, ev, (vec, cluster) => {
      s"""${ev.value} = graft.functions.PqResidualAssignCodes.assign(
         |  $vec, $cluster, $meansRef, $booksRef);""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqResidualAssignCodes =
    copy(left = newLeft, right = newRight)
}

object PqResidualAssignCodes {

  def assign(vec: ArrayData, cluster: Int, ms: MeansPacked,
      p: PqAssignCodes.Packed): ArrayData = {
    val n = vec.numElements()
    if (cluster < 0 || cluster >= ms.cells)
      throw new SparkException(
        s"graft_pq_res_assign: cluster $cluster outside the " +
          s"${ms.cells}-cell mean matrix")
    if (n != ms.dim)
      throw new SparkException(
        s"graft_pq_res_assign: vector dim $n does not match the cell-mean " +
          s"dim ${ms.dim} — mismatched corpus/means artifacts")
    if (n % p.m != 0)
      throw new SparkException(
        s"PQ: vector dim $n is not divisible by m=${p.m} — trailing " +
          "dimensions would be silently dropped from the codes")
    if (n / p.m != p.subDim)
      throw new SparkException(
        s"graft_pq_res_assign: vector subspace dim ${n / p.m} does not " +
          s"match the codebook's ${p.subDim} — mismatched artifacts")
    val mBase = cluster * ms.dim
    val codes = new Array[Int](p.m)
    var s = 0
    while (s < p.m) {
      var best = Double.MaxValue
      var bc = -1
      var c = 0
      while (c < p.k) {
        var acc = 0.0
        var sawNull = false
        val base = (s * p.k + c) * p.subDim
        var j = 0
        while (j < p.subDim && !sawNull) {
          val idx = s * p.subDim + j
          if (vec.isNullAt(idx)) sawNull = true
          else {
            acc += (vec.getDouble(idx) - ms.flat(mBase + idx)) * p.flat(base + j)
            j += 1
          }
        }
        if (!sawNull) {
          val d = p.norms(s * p.k + c) - 2.0 * acc
          if (d < best) { best = d; bc = c }
        }
        c += 1
      }
      codes(s) = bc
      s += 1
    }
    new GenericArrayData(codes)
  }

  def ofColumns(vec: Column, cluster: Column, means: Seq[Seq[Double]],
      books: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(PqResidualAssignCodes(
      ColumnBridge.expression(vec), ColumnBridge.expression(cluster),
      means, books))
}

/** Native reconstruction norm for a residual-PQ index row:
  * ‖μ(cluster) + concat_s cb_s_{codes[s]}‖ — the `rnorm` every ADC
  * probe divides by, previously a zip_with + flatten-of-element_at
  * recon array per row followed by a dot. Accumulation parity is
  * exact: recon[j] = mean[j] + codeword[j] (same double add, subspace-
  * major order), squared and summed in index order like
  * [[ArrayDotProduct]], then java.lang.Math.sqrt — the same sqrt
  * Spark's `sqrt` evaluates. A null cluster/codes yields null; a null
  * code element yields null (the composed form's null-poisoned dot);
  * out-of-range indices RAISE like ANSI element_at.
  */
case class PqReconNorm(left: Expression, right: Expression,
    means: Seq[Seq[Double]], books: Seq[Seq[Seq[Double]]])
    extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    if (books.isEmpty || books.exists(_.isEmpty) ||
      books.exists(_.exists(_.isEmpty)))
      return TypeCheckResult.TypeCheckFailure("graft_pq_recon_norm: empty codebook")
    if (means.isEmpty)
      return TypeCheckResult.TypeCheckFailure(
        "graft_pq_recon_norm: empty cell-mean matrix")
    if (left.dataType != IntegerType)
      return TypeCheckResult.TypeCheckFailure(
        s"graft_pq_recon_norm requires an int cluster, got ${left.dataType}")
    right.dataType match {
      case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_recon_norm requires array<int> codes, got $t")
    }
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_recon_norm"

  @transient private lazy val packedBooks: PqAssignCodes.Packed =
    PqAssignCodes.pack(books)
  @transient private lazy val packedMeans: MeansPacked = MeansPacked.pack(means)

  override protected def nullSafeEval(cluster: Any, codes: Any): Any =
    PqReconNorm.norm(cluster.asInstanceOf[Int],
      codes.asInstanceOf[ArrayData], packedMeans, packedBooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("reconBooks", packedBooks,
      classOf[PqAssignCodes.Packed].getName)
    val meansRef = ctx.addReferenceObj("reconMeans", packedMeans,
      classOf[MeansPacked].getName)
    nullSafeCodeGen(ctx, ev, (cluster, codes) => {
      val r = ctx.freshName("reconNorm")
      s"""
         |java.lang.Double $r = graft.functions.PqReconNorm.norm(
         |  $cluster, $codes, $meansRef, $booksRef);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqReconNorm =
    copy(left = newLeft, right = newRight)
}

object PqReconNorm {

  def norm(cluster: Int, codes: ArrayData, ms: MeansPacked,
      p: PqAssignCodes.Packed): java.lang.Double = {
    if (cluster < 0 || cluster >= ms.cells)
      throw new SparkException(
        s"graft_pq_recon_norm: cluster $cluster outside the " +
          s"${ms.cells}-cell mean matrix")
    if (codes.numElements() != p.m)
      throw new SparkException(
        s"graft_pq_recon_norm: ${codes.numElements()} codes for a " +
          s"${p.m}-subspace codebook — mismatched artifacts")
    if (p.m * p.subDim != ms.dim)
      throw new SparkException(
        s"graft_pq_recon_norm: codebook dim ${p.m * p.subDim} does not " +
          s"match the cell-mean dim ${ms.dim} — mismatched artifacts")
    val mBase = cluster * ms.dim
    var acc = 0.0
    var s = 0
    while (s < p.m) {
      if (codes.isNullAt(s)) return null
      val c = codes.getInt(s)
      if (c < 0 || c >= p.k)
        throw new SparkException(
          s"graft_pq_recon_norm: code $c at subspace $s is outside [0, ${p.k})")
      val base = (s * p.k + c) * p.subDim
      var j = 0
      while (j < p.subDim) {
        val x = ms.flat(mBase + s * p.subDim + j) + p.flat(base + j)
        acc += x * x
        j += 1
      }
      s += 1
    }
    java.lang.Math.sqrt(acc)
  }

  def ofColumns(cluster: Column, codes: Column, means: Seq[Seq[Double]],
      books: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(PqReconNorm(
      ColumnBridge.expression(cluster), ColumnBridge.expression(codes),
      means, books))
}
