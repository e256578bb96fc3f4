package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.functions.BloomMightContain

/** Bloom-filter semi-join pruning: for a SELECTIVE equi-join where the
  * build side is too large to broadcast as a hash table but its KEY SET
  * compresses into a bloom filter (KBs–MBs at millions of keys), build
  * the filter in one pass over the build side and pre-filter the probe
  * side BEFORE its shuffle — probe rows that cannot match never leave
  * their input partition. The exact join then removes the false
  * positives, so the result is identical to the plain join.
  *
  * This is the manual form of dynamic data pruning for non-partition
  * keys: at 100 TB the win is shuffle bytes, which dominate selective
  * fact–fact joins. `fpp` trades filter size against wasted shuffle
  * (default 3 % false positives). When the build side is small enough to
  * broadcast, skip this — the broadcast hash join already prunes.
  */
object BloomPrune {

  /** Inner equi-join with the probe side bloom-pruned on the join key.
    * Result is row-identical to `probe.join(build, probe(pk) === build(bk))`.
    */
  def prunedInnerJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val pruned = pruneProbe(probe, build, probeKey, buildKey, expectedItems, fpp)
    pruned.join(build, pruned(probeKey) === build(buildKey))
  }

  /** Just the pruned probe side (compose with any join type whose result
    * only needs probe rows that HAVE a build match — inner/left-semi).
    */
  def pruneProbe(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    // one distributed pass over the build side; the driver holds only the
    // merged ~`-n*ln(fpp)/ln(2)^2`-bit filter
    val bloom = build.stat.bloomFilter(buildKey, expectedItems, fpp)
    probe.filter(BloomMightContain.ofColumn(col(probeKey), bloom))
  }
}
