package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric int8 embedding quantization — the storage/serving format a
  * 100 TB vector corpus actually ships (4× smaller than float32, SIMD
  * dot products at serve time): per vector, scale = max|v|/127 and
  * q_i = round(v_i/scale) clamped to [-127, 127].
  *
  * Determinism contract: arithmetic is double-exact and rounding is
  * written as floor(x + 0.5) — identical on every engine — rather than
  * an engine's round() builtin (Spark HALF_UP vs others' HALF_EVEN
  * would flip ties). The all-zero vector quantizes to scale 0 and all
  * zeros rather than dividing by zero. Narrow pass, no shuffle.
  */
object Quantize {

  /** round-half-up as pure floor arithmetic (no engine round()). */
  private def roundHalfUp(x: Column): Column = floor(x + lit(0.5))

  /** (scale, int8 codes) for a float-array column — the DEFINITIONAL
    * form the spec pins. NOTE: referencing `scale` (which folds over
    * the whole array) inside the per-element lambda makes this O(d²)
    * when evaluated as one expression — HOF lambdas re-evaluate their
    * body per element and are not subexpression-eliminated. The
    * DataFrame entry points below materialize (v, scale) behind a
    * Generate barrier first and stay O(d); use them in pipelines.
    */
  def int8(vec: Column): (Column, Column) = {
    val v = transform(vec, _.cast("double"))
    val amax = array_max(transform(v, x => abs(x)))
    val scale = amax / lit(127.0)
    (scale, codeExpr(v, scale))
  }

  /** Clamped half-up codes given already-computed (v, scale) columns. */
  private def codeExpr(v: Column, scale: Column): Column =
    when(scale === 0.0, transform(v, _ => lit(0).cast("int")))
      .otherwise(transform(v, x =>
        greatest(lit(-127.0), least(lit(127.0), roundHalfUp(x / scale)))
          .cast("int")))

  /** (id, v, scale) with BOTH materialized at an explode(array(struct))
    * Generate barrier — the same CollapseProject countermeasure
    * chunkDocs/minhashIndex document: without it the array_max fold
    * inlines into the per-element code lambda (O(d²) per vector) and
    * the cast chain re-runs per element.
    */
  private def prepared(df: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val v = transform(col(vecCol), _.cast("double"))
    df.select(col(idCol), explode(array(struct(
      v.as("v"),
      (array_max(transform(v, x => abs(x))) / lit(127.0)).as("scale"))))
      .as("s"))
      .select(col(idCol), col("s.v").as("v"), col("s.scale").as("scale"))
  }

  /** (id, qv) code vectors — the serving projection ANN search runs on
    * ([[graft.queries.AnnQ]] wires it into the brute-force ranker: code
    * dots are small-integer sums, exact in doubles, so quantized search
    * is fully deterministic and cross-engine oracle-able).
    */
  def codes(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    prepared(graft.ops.FanOut(df), idCol, vecCol)
      .select(col(idCol), codeExpr(col("v"), col("scale")).as("qv"))

  /** Quantize `vecCol` of `df`: (id, scale, q_csv, n_sat) where q_csv is
    * the comma-joined code vector (portable for cross-engine compare)
    * and n_sat counts saturated codes (|q| = 127) — the overflow-health
    * signal a quantized index monitors.
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    // qv binds BEFORE the output projection: emitting round(scale,6) AS
    // "scale" in the same select would make codeExpr's col("scale") a
    // LATERAL COLUMN ALIAS reference to the ROUNDED value (Spark 3.4+
    // lateral alias resolution shadows the child column), silently
    // quantizing against 0.01-style truncated scales
    prepared(df, idCol, vecCol)
      .withColumn("qv", codeExpr(col("v"), col("scale")))
      .select(col(idCol),
        round(col("scale"), 6).as("scale"),
        array_join(transform(col("qv"), _.cast("string")), ",").as("q_csv"),
        size(filter(col("qv"), c => abs(c) === 127)).cast("long").as("n_sat"))
}
