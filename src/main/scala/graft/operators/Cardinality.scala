package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.KmvFunctions

/** Sketch-based distinct counting — the cardinality estimator a 100 TB
  * pipeline runs BEFORE committing to an exact distinct (sizing dedup
  * jobs, choosing join strategies, budgeting vocabulary builds). Standard
  * error ~ 1/sqrt(k): k=256 gives ~6%.
  *
  * Deterministic by construction (see [[graft.functions.KMinValues]]):
  * the k smallest md5 hashes of the key are a pure function of the key
  * SET, so the estimate is identical across partitionings, retries and
  * engines — q82's DuckDB twin recomputes sketch AND estimate value-exact.
  * The aggregation is map-side combined: each task contributes ≤ k longs.
  */
object Cardinality {

  /** First 32 md5 bits of (key ":" salt) as a long — [[Sampling.hash32]]
    * over the family's salted-key input; null keys hash as the empty
    * string.
    */
  def hash32(key: Column, salt: String): Column =
    Sampling.hash32(concat(coalesce(key.cast("string"), lit("")),
      lit(":" + salt)))

  /** Per-group distinct-count estimate of `key`. Output: the group
    * columns + k_used (sketch fill), kth (largest retained hash, null on
    * empty groups), est (EXACT fill when the sketch is under-full —
    * everything fit, so it IS the distinct count modulo 32-bit hash
    * collisions — else the KMV estimator (k-1) * 2^32 / kth).
    */
  def kmvDistinct(df: DataFrame, key: Column, k: Int,
      groupCols: Seq[Column] = Nil, salt: String = "graft"): DataFrame = {
    val g = if (groupCols.isEmpty) df.groupBy() else df.groupBy(groupCols: _*)
    g.agg(KmvFunctions.kmv_sketch(hash32(key, salt), k).as("mins"))
      .withColumn("k_used", size(col("mins")))
      .withColumn("kth", element_at(col("mins"), -1))
      .withColumn("est",
        when(col("k_used") < k, col("k_used").cast("double"))
          .otherwise(lit((k - 1) * 4294967296.0) / col("kth")))
      .drop("mins")
  }
}
