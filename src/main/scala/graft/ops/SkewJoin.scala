package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys. AQE's skew-join handles most cases at
  * runtime, but a hot key that concentrates in ONE reducer after the
  * shuffle (e.g. a null-ish default id owning 10% of a 100 TB fact)
  * still needs salting when the join is sort-merge and the skew exceeds
  * what split-and-replicate can absorb.
  *
  * The big side gets a deterministic per-row salt in [0, salts); the
  * small side is replicated `salts`×. Every (big, small) key match
  * meets on exactly one (key, salt) pair, so the result multiset equals
  * the plain inner join's — verified by the DuckDB oracle — while the
  * hot key's rows spread across `salts` reducers.
  */
object SkewJoin {

  def saltedInner(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0)
    // salt from the full row hash: deterministic (safe under task
    // retries, unlike rand()) and uniform across a hot key's rows
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salts)).cast("int"))
    val smallReplicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigSalted.join(smallReplicated, Seq(key, "__salt")).drop("__salt")
  }
}
