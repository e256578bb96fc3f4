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

  /** (scale, int8 codes) for a float-array column. */
  def int8(vec: Column): (Column, Column) = {
    val v = transform(vec, _.cast("double"))
    val amax = array_max(transform(v, x => abs(x)))
    val scale = amax / lit(127.0)
    val q = when(amax === 0.0,
      transform(v, _ => lit(0).cast("int")))
      .otherwise(transform(v, x =>
        greatest(lit(-127.0), least(lit(127.0), roundHalfUp(x / scale)))
          .cast("int")))
    (scale, q)
  }

  /** (id, qv) code vectors — the serving projection ANN search runs on
    * ([[graft.queries.AnnQ]] wires it into the brute-force ranker: code
    * dots are small-integer sums, exact in doubles, so quantized search
    * is fully deterministic and cross-engine oracle-able).
    */
  def codes(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), int8(col(vecCol))._2.as("qv"))

  /** Quantize `vecCol` of `df`: (id, scale, q_csv, n_sat) where q_csv is
    * the comma-joined code vector (portable for cross-engine compare)
    * and n_sat counts saturated codes (|q| = 127) — the overflow-health
    * signal a quantized index monitors.
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val (scale, q) = int8(col(vecCol))
    df.select(col(idCol),
      round(scale, 6).as("scale"),
      array_join(transform(q, _.cast("string")), ",").as("q_csv"),
      size(filter(q, c => abs(c) === 127)).cast("long").as("n_sat"))
  }
}
