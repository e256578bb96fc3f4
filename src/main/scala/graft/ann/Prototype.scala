package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Nearest-class-centroid ("prototype") classification over the
  * embedding table — the cheapest useful embedding-quality eval a data
  * pipeline runs: per-label mean vectors as class prototypes, every
  * vector assigned to its max-cosine prototype, confusion counts out.
  * A collapsing embedding space shows up immediately as off-diagonal
  * mass (Snell et al.'s prototypical networks reduced to eval-only).
  *
  * Cross-engine exactness: per-label means go through EXACT
  * DECIMAL(18,9) sums (double sums are addition-order-dependent; a
  * float is never exactly a 9dp midpoint, so the cast is
  * rounding-mode-independent), divided to doubles only at the end —
  * so prototypes are bit-identical in both engines, and the argmax
  * (iterated in ascending label order with a strict >, i.e. ties keep
  * the smaller label) mirrors the oracle's ORDER BY cosine DESC, label.
  *
  * Scale shape: means are ONE fused map-side-combinable aggregate
  * (nLabels × dim decimals shuffle — metadata-sized); prototypes ship
  * back as literals, classification is one narrow pass; the confusion
  * matrix is an nLabels²-key aggregate.
  */
object Prototype {

  /** (label, mean ARRAY<DOUBLE>) — exact-decimal elementwise means. */
  def labelMeans(emb: DataFrame, vecCol: String,
      labelCol: String): DataFrame = {
    val vd = transform(col(vecCol), x => x.cast(DecimalType(18, 9)))
    val base = emb.select(col(labelCol).as("label"), vd.as("vd"))
    val first = base.select(size(col("vd"))).head(1)
    require(first.nonEmpty, "labelMeans: empty embedding table")
    val dim = first(0).getInt(0)
    val sums = (0 until dim).map(j =>
      sum(element_at(col("vd"), j + 1)).as(s"s$j"))
    base.groupBy(col("label"))
      .agg(count(lit(1)).as("n"), sums: _*)
      .select(col("label"), array((0 until dim).map(j =>
        col(s"s$j").cast("double") / col("n").cast("double")): _*).as("mean"))
  }

  /** Confusion counts (label, predicted, n) under max-cosine prototype
    * assignment. Zero-norm vectors score 0 against every prototype and
    * deterministically take the smallest label.
    */
  def confusion(emb: DataFrame, vecCol: String,
      labelCol: String): DataFrame = {
    import graft.functions.ArrayDotProduct.ofColumns
    val protos = labelMeans(emb, vecCol, labelCol).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).sortBy(_._1)
    val v = col(vecCol).cast("array<double>")
    val base = emb.select(col(labelCol).as("label"), v.as("v"))
      .withColumn("nv", sqrt(ofColumns(col("v"), col("v"))))
    // argmax as an aggregate() LAMBDA over the prototype matrix, like
    // Ann's assignment expression: the accumulator is a bound lambda
    // variable, so the expression stays O(nLabels) — a plain foldLeft
    // of when(c > acc.c, …, acc) references acc on BOTH branches and
    // expands exponentially in nLabels. Iteration is ascending label
    // order with a strict >, so exact ties keep the smaller label —
    // the oracle's (cosine DESC, label) rank.
    val mlit = typedlit(protos.map(_._2.toIndexedSeq))
    val lablit = typedlit(protos.map(_._1))
    // zero-norm prototypes score 0 (not NULL/NaN): a divide-by-zero
    // NULL would silently make that label unreachable (and an oracle's
    // NaN cosine would sort FIRST and claim every row) — the operator
    // pins the 0 convention on both sides of the division
    val nlit = typedlit(protos.map(p => math.sqrt(p._2.map(x => x * x).sum)))
    val best = aggregate(
      sequence(lit(0), lit(protos.size - 1)),
      struct(lit(Double.NegativeInfinity).as("c"), lit(-1).as("l")),
      (acc, i) => {
        val c = when(col("nv") > 0.0 && element_at(nlit, i + 1) > 0.0,
          ofColumns(col("v"), element_at(mlit, i + 1)) /
            (col("nv") * element_at(nlit, i + 1)))
          .otherwise(lit(0.0))
        when(c > acc.getField("c"),
          struct(c.as("c"), element_at(lablit, i + 1).as("l")))
          .otherwise(acc)
      })
    base.withColumn("predicted", best.getField("l"))
      .groupBy(col("label"), col("predicted"))
      .agg(count(lit(1)).as("n"))
  }
}
