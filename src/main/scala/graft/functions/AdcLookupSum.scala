package graft.functions

import org.apache.spark.SparkException
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native ADC lookup-sum: Σ_s lut[s·k + codes[s]] over an
  * `array<int>` code column and an `array<double>` LUT column — the
  * per-row hot loop of every PQ-family probe ([[graft.ann.Pq.adcTopK]],
  * [[graft.ann.IvfPq.probe]]).
  *
  * The public-API form — `aggregate(sequence(0, m−1), 0d,
  * (acc, s) => acc + element_at(lut, s·k + element_at(codes, s+1) + 1))`
  * — is a higher-order function: interpreted lambda dispatch per
  * element plus a per-row sequence allocation, embedded in the probe
  * stage's whole-stage-codegen kernel as a CodegenFallback island. On
  * the full-corpus ADC members that island dominated the probe AND made
  * the generated kernel large enough to trip HotSpot's
  * huge-method/recompilation cutoffs — the measured bimodal
  * compiled-vs-interpreted kernel flips (BENCH_NOTES r16 "bimodal
  * generated-kernel performance"; 2.5 s vs 10–30 s samples on identical
  * plans). This expression is one tight monomorphic loop inside
  * codegen — the "smaller generated kernels" structural fix that note
  * names.
  *
  * Semantics are EXACTLY the fold's on every input the probes can see,
  * including the degenerate cases — a null codes/lut array, a null
  * code element, or a null looked-up LUT entry yields null (null
  * poisons the fold's addition); a code
  * whose flattened index falls outside the LUT raises a descriptive
  * error (the fold's `element_at` under ANSI raises there too, with a
  * positional message). Accumulation is index-order s = 0…m−1 like the
  * fold, so sums are bit-identical (AdcLookupSumSpec pins differential
  * equality against the fold on random and adversarial inputs).
  *
  * The subspace count is `codes`'s own length: every producer writes
  * exactly m codes per row and a lut of m·k entries, and the length
  * require below rejects a mismatched pair loudly rather than summing
  * a prefix.
  */
case class AdcLookupSum(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    if (k <= 0)
      return TypeCheckResult.TypeCheckFailure(
        s"graft_adc_sum requires a positive codes-per-subspace k, got $k")
    left.dataType match {
      case ArrayType(IntegerType, _) =>
        right.dataType match {
          case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
          case t => TypeCheckResult.TypeCheckFailure(
            s"graft_adc_sum requires an array<double> lut, got $t")
        }
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_adc_sum requires array<int> codes, got $t")
    }
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_adc_sum"

  override protected def nullSafeEval(codes: Any, lut: Any): Any =
    AdcLookupSum.sumOrNull(codes.asInstanceOf[ArrayData],
      lut.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val r = ctx.freshName("adcSum")
      s"""
         |java.lang.Double $r =
         |  graft.functions.AdcLookupSum.sumOrNull($codes, $lut, $k);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcLookupSum =
    copy(left = newLeft, right = newRight)
}

object AdcLookupSum {

  /** Index-order lookup-accumulate with the fold's null semantics: a
    * null code element → null; an index outside the LUT → a descriptive
    * error (never a silent skip or a wrong-subspace read).
    */
  def sumOrNull(codes: ArrayData, lut: ArrayData, k: Int): java.lang.Double = {
    val m = codes.numElements()
    val lutLen = lut.numElements()
    if (lutLen != m.toLong * k)
      throw new SparkException(
        s"graft_adc_sum: lut has $lutLen entries but codes imply " +
          s"$m subspaces × $k codes = ${m.toLong * k} — mismatched " +
          "codebook artifacts")
    var acc = 0.0d
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) return null
      val c = codes.getInt(s)
      if (c < 0 || c >= k)
        throw new SparkException(
          s"graft_adc_sum: code $c at subspace $s is outside [0, $k)")
      if (lut.isNullAt(s * k + c)) return null
      acc += lut.getDouble(s * k + c)
      s += 1
    }
    acc
  }

  /** DataFrame-API entry point. */
  def ofColumns(codes: Column, lut: Column, k: Int): Column =
    ColumnBridge.column(
      AdcLookupSum(ColumnBridge.expression(codes),
        ColumnBridge.expression(lut), k))
}
