package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document token statistics in ONE pass over the token
  * array: element 0 is Σ length(token) (characters, the
  * [[graft.text.TextOps.totalTokenChars]] fold), element i+1 is the
  * number of tokens contained in marker set i (the
  * `size(filter(toks, array_contains(markers, t)))` count behind
  * [[graft.text.TextOps.wordRatio]] — multiset semantics, duplicates
  * count).
  *
  * The composed form paid one interpreted HOF island per statistic —
  * the quality/language members evaluate up to six of them per
  * document (stopword hits + five language marker sets + the length
  * fold), each a per-token interpreted lambda dispatch with an
  * array_contains scan of its marker literal. Here: one monomorphic
  * loop per document, marker sets as hashed reference objects, inside
  * whole-stage codegen.
  *
  * Parity is exact and integer: character counts use the same UTF-8
  * character semantics as Spark's `length` (UTF8String.numChars), hits
  * use the same string equality as `array_contains`, and every output
  * is a long — the consuming ratios divide the SAME exact integers they
  * divided before (TokenStatsSpec pins the differential per statistic).
  * A null token contributes length null → the fold's total would be
  * null — replicated: a null element nulls element 0; array_contains
  * skips nulls, so hit counts ignore null tokens, also replicated. A
  * null array row is null.
  */
case class TokenStats(child: Expression,
    markerSets: Seq[Seq[String]]) extends UnaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_token_stats requires array<string> tokens, got $t")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_token_stats"

  @transient private lazy val packed: TokenStats.Packed =
    TokenStats.pack(markerSets)

  override protected def nullSafeEval(toks: Any): Any =
    TokenStats.stats(toks.asInstanceOf[ArrayData], packed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val packedRef = ctx.addReferenceObj("tokenStatsSets", packed,
      classOf[TokenStats.Packed].getName)
    nullSafeCodeGen(ctx, ev, toks => {
      s"${ev.value} = graft.functions.TokenStats.stats($toks, $packedRef);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

object TokenStats {

  /** Marker sets as UTF8String hash sets — membership is the same
    * byte-equality `array_contains` uses on strings.
    */
  case class Packed(sets: Array[java.util.HashSet[UTF8String]])
    extends Serializable

  def pack(markerSets: Seq[Seq[String]]): Packed =
    Packed(markerSets.map { set =>
      val h = new java.util.HashSet[UTF8String](set.size * 2)
      set.foreach(s => h.add(UTF8String.fromString(s)))
      h
    }.toArray)

  def stats(toks: ArrayData, p: Packed): ArrayData = {
    val n = toks.numElements()
    val out = new Array[Any](1 + p.sets.length)
    val hits = new Array[Long](p.sets.length)
    var totalChars = 0L
    var sawNullTok = false
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) {
        // length(null) nulls the character fold; array_contains skips
        sawNullTok = true
      } else {
        val t = toks.getUTF8String(i)
        totalChars += t.numChars()
        var s = 0
        while (s < p.sets.length) {
          if (p.sets(s).contains(t)) hits(s) += 1
          s += 1
        }
      }
      i += 1
    }
    out(0) = if (sawNullTok) null else java.lang.Long.valueOf(totalChars)
    var s = 0
    while (s < p.sets.length) {
      out(1 + s) = java.lang.Long.valueOf(hits(s))
      s += 1
    }
    new GenericArrayData(out)
  }

  /** DataFrame-API entry point over an `array<string>` column. */
  def ofColumn(toks: Column, markerSets: Seq[Seq[String]]): Column =
    ColumnBridge.column(TokenStats(ColumnBridge.expression(toks), markerSets))
}
