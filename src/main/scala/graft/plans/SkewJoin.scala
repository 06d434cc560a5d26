package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY §7.1 step 8).
  *
  * A plain `fact.join(dim, key)` hashes every row of a hot key into ONE
  * shuffle partition; at 100 TB a single pathological key (a delisted
  * product, an empty-string doc bucket) straggles the whole stage. Salting
  * spreads each key over `salts` partitions: the fact side gets a
  * deterministic salt in [0, salts), the dim side is replicated `salts`
  * times, and the join key becomes (key, salt). Results are identical to
  * the unsalted join — verified against the DuckDB oracle — at the cost of
  * a `salts`× blow-up of the (small) dim side.
  *
  * AQE's skew-join mitigation already splits oversized sort-merge
  * partitions at runtime; explicit salting still matters when (a) the
  * skewed side feeds an aggregation on the same key (AQE cannot split a
  * hash-agg's key), or (b) the join is forced broadcast-free by build-side
  * size just above the threshold.
  */
object SkewJoin {

  /** Inner equi-join of `fact` (possibly skewed on `key`) with `dim`
    * (small enough to replicate `salts` times). Column sets must be
    * disjoint apart from `key`. */
  def salted(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    // Deterministic pseudo-random salt from the fact row's key + a cheap
    // row discriminator; any distribution works for correctness, uniform
    // is best for balance.
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(salts)))
    val saltedDim = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
