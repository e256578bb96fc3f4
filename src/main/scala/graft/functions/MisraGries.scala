package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries frequent-items ("heavy hitters") summary — the third
  * sketch family next to HLL distinct and approximate quantiles: one
  * pass, O(k) state, fully mergeable (Agarwal et al., "Mergeable
  * Summaries"), so partial aggregation works map-side like any other
  * agg. Guarantees, with N = total items and error budget `shed`
  * tracked in the state: estimates never overcount,
  * `est ≤ true ≤ est + shed`, and every item with true frequency
  * > shed survives in the summary; shed ≤ N/(k+1).
  *
  * The classic per-miss decrement-all is O(k) per row; this uses the
  * standard batched form — let the map grow to 2k, then subtract the
  * (k+1)-th largest count and drop non-positives — which amortizes the
  * trim and preserves the same bound (each trim is one merge-with-empty
  * in the mergeable-summaries sense).
  */
object MisraGries {

  /** (item, estimate) entries + the total shed weight (the uniform
    * upper bound on undercounting).
    */
  final case class Summary(items: Map[String, Long], shed: Long)

  final case class Buf(counts: Map[String, Long], shed: Long)

  final class MisraGriesAgg(k: Int) extends Aggregator[String, Buf, Summary] {
    require(k > 0)

    override def zero: Buf = Buf(Map.empty, 0L)

    /** Keep at most `cap` entries: subtract the (k+1)-th largest count
      * from everything, drop non-positives, book the shed weight.
      */
    private def trim(b: Buf, cap: Int): Buf =
      if (b.counts.size <= cap) b
      else {
        val kth = b.counts.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
        Buf(b.counts.collect {
          case (t, c) if c > kth => t -> (c - kth)
        }, b.shed + kth)
      }

    override def reduce(b: Buf, item: String): Buf =
      if (item == null) b // SQL aggregate convention: nulls don't count
      else trim(Buf(b.counts.updated(item, b.counts.getOrElse(item, 0L) + 1L),
        b.shed), 2 * k)

    override def merge(a: Buf, b: Buf): Buf = {
      val merged = b.counts.foldLeft(a.counts) { case (m, (t, c)) =>
        m.updated(t, m.getOrElse(t, 0L) + c)
      }
      // trim to k entries (not 2k) on merge so the final summary is k-sized
      trim(Buf(merged, a.shed + b.shed), k)
    }

    override def finish(b: Buf): Summary = Summary(b.counts, b.shed)

    override def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
    override def outputEncoder: Encoder[Summary] = ExpressionEncoder[Summary]()
  }

  /** Column aggregate: heavy-hitters summary of a string column. */
  def ofColumn(c: Column, k: Int): Column = udaf(new MisraGriesAgg(k), Encoders.STRING).apply(c)
}
