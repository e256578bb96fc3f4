package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-shuffled) table layout — the co-located-join
  * infrastructure every warehouse at scale runs on: pay the shuffle
  * ONCE at write time by hash-bucketing both fact and dimension on the
  * join key, and every subsequent join on that key is exchange-free —
  * Spark's scan reports `HashPartitioning(key, nBuckets)` on both
  * sides, so the SortMergeJoin plans with NO ShuffleExchange under it.
  *
  * At 100 TB this is the difference between re-shuffling petabytes per
  * query and reading co-located bucket files: the nightly ETL buckets
  * the big tables on their join keys (thousands of buckets — one per
  * final-stage task); here the count is a parameter and the contract
  * (same count, same key, both sides) is what matters.
  *
  * Tables are managed per-JVM through [[StageArtifacts]]: one
  * `graft_b_<pathIdent>` database per dataset dir rooted in the
  * managed temp root (shutdown-hook cleanup, MD5 path keys — no
  * String.hashCode collisions), built once and reused so the write
  * cost and the exchange-free read cost are separately measurable.
  */
object Bucketing {

  /** Per-table build memo. The CHM only ever holds cheap slot
    * construction inside `computeIfAbsent`; the Spark write runs under
    * the SLOT's monitor, so a long build serializes per table without
    * pinning the map bin (unrelated tables hashing to the same bin
    * proceed). A failed build leaves `spec` unset — the retry re-enters
    * and its `mode("overwrite")` replaces any partial table.
    */
  private final class BuildSlot {
    private var spec: Option[(String, Int)] = None
    def ensure(key: String, nBuckets: Int)(run: => Unit): (String, Int) =
      synchronized {
        spec.getOrElse {
          run
          val s = (key, nBuckets)
          spec = Some(s)
          s
        }
      }
  }

  private val builtTables =
    new java.util.concurrent.ConcurrentHashMap[String, BuildSlot]()

  /** Ensure `name` exists as a bucketed+sorted managed table of
    * `build`'s frame in the dataset's bucket database; returns the
    * fully-qualified table name. Build-once per (JVM, dataDir); the
    * database has ONE managed dir all its tables live under (a
    * per-table artifact dir would be a decoy — managed table files
    * always land under the database location). Re-requesting a built
    * table with a different key or bucket count fails loudly instead
    * of silently serving the stale layout.
    */
  def ensureBucketed(spark: SparkSession, dataDir: String, name: String,
      key: String, nBuckets: Int)(build: => DataFrame): String = {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    val db = s"graft_b_${StageArtifacts.pathIdent(dataDir)}"
    StageArtifacts.ensure(dataDir, "bucket-db") { dir =>
      spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$dir'")
    }
    val table = s"$db.$name"
    val slot = builtTables.computeIfAbsent(table, _ => new BuildSlot)
    val spec = slot.ensure(key, nBuckets) {
      build.write
        .bucketBy(nBuckets, key)
        .sortBy(key)
        .mode("overwrite")
        .saveAsTable(table)
    }
    require(spec == ((key, nBuckets)),
      s"bucketed table $table already built with (key, buckets) = $spec; " +
        s"requested ($key, $nBuckets) — pick a different table name")
    table
  }

  /** The orders/customer pair bucketed on custkey — the layout
    * `q_bucketed_join` (and its spec) joins exchange-free. Only the
    * joined/aggregated columns are bucketed: layout jobs prune too.
    */
  def bucketedOrdersCustomer(spark: SparkSession,
      dataDir: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.col
    val o = ensureBucketed(spark, dataDir, "orders_bk", "o_custkey", 8)(
      graft.Tables(spark, dataDir, "orders")
        .select(col("o_custkey"), col("o_totalprice")))
    val c = ensureBucketed(spark, dataDir, "customer_bk", "c_custkey", 8)(
      graft.Tables(spark, dataDir, "customer")
        .select(col("c_custkey"), col("c_nationkey")))
    (spark.table(o), spark.table(c))
  }
}
