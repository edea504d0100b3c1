package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and split assignment for
  * training-data pipelines.
  *
  * `df.sample()` is the wrong tool at 100 TB: its draw depends on the
  * partition layout and per-partition seed, so a retry, a repartition, an
  * AQE re-plan, or tomorrow's re-run over one more file all select a
  * DIFFERENT subset — and a train/eval split done that way silently leaks.
  * Every operator here instead keys the draw on a CONTENT hash of a caller
  * -chosen key column (md5, first 8 hex chars ~ uniform on [0, 2^32)), so
  * membership is a pure function of the row's key:
  *
  *   - stable under repartitioning, retries, AQE, and cluster size;
  *   - reproducible across engines (the DuckDB oracles recompute the same
  *     md5 prefix and compare value-exact — q64-q66);
  *   - incremental-friendly: yesterday's sampled rows stay sampled when
  *     new data accretes (the property reservoir/RNG sampling cannot give);
  *   - disjointness by construction: distinct salts give independent
  *     draws, one salt's split buckets partition the keyspace exactly.
  *
  * All row-level ops are narrow (a filter or projection over one md5 call
  * — codegen'd, no shuffle, no RNG state); only the per-group top-k pays
  * the one unavoidable hash shuffle on its group key.
  *
  * Reference kin: the 75/25 train split (M7, ClassificationModelGeneration
  * .py:100) is the reference's only sampling op; these generalize it to
  * the deterministic at-scale forms a 10^12-turn corpus needs.
  */
object Sampling {

  /** Uniform draw in hex-string space: first 8 hex chars of
    * md5(key ":" salt), lexicographically comparable against
    * [[cutoffHex]] thresholds (fixed-width lowercase hex orders exactly
    * like the 32-bit value it encodes). Null keys hash as the empty
    * string so they draw deterministically instead of vanishing.
    */
  def unitHex(key: Column, salt: String): Column =
    substring(md5(concat(coalesce(key.cast("string"), lit("")), lit(":" + salt))), 1, 8)

  /** First 32 md5 bits of an arbitrary input column as a non-negative
    * long — the NUMERIC form of [[unitHex]]'s draw domain, shared by
    * every operator whose DuckDB twin recomputes
    * `('0x' || substr(md5(x), 1, 8))::UBIGINT` (Negatives draws,
    * Cardinality sketches, GraphMetrics walk steps). One definition so
    * the cross-engine hash contract can never drift per call site.
    */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** `floor(rate * 2^32)` as 8 lowercase hex chars — the keep-threshold
    * for [[unitHex]]. rate 1.0 clamps to "ffffffff" (excludes ~2^-32 of
    * keys; callers wanting keep-all skip the filter instead).
    */
  def cutoffHex(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1]: $rate")
    f"${math.min((rate * 4294967296.0).toLong, 4294967295L)}%08x"
  }

  /** Deterministic Bernoulli(rate) sample keyed on `key`: keep a row iff
    * its hash draw falls under the rate cutoff. Pure narrow filter.
    */
  def hashSample(df: DataFrame, key: Column, rate: Double,
      salt: String = "graft"): DataFrame =
    if (rate >= 1.0) df else df.filter(unitHex(key, salt) < lit(cutoffHex(rate)))

  /** Split-assignment column: maps each key into one of the named buckets
    * with the given weights (must sum to 1). The buckets partition the
    * keyspace — every key lands in exactly one — and assignment is stable
    * forever for a given (key, salt), so train rows can never drift into
    * eval on a re-run. The last bucket is the CASE else-branch, absorbing
    * the rounding remainder.
    */
  def splitColumn(key: Column, weights: Seq[(String, Double)],
      salt: String = "graft"): Column = {
    require(weights.size >= 2, "need at least two buckets")
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"weights must sum to 1: $weights")
    val h = unitHex(key, salt)
    val cum = weights.map(_._2).scanLeft(0.0)(_ + _).tail
    weights.init.zip(cum.init).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), upto)) =>
        val cond = h < lit(cutoffHex(upto))
        Some(acc.fold(when(cond, name))(_.when(cond, name)))
    }.get.otherwise(weights.last._1)
  }

  /** Stratified deterministic sample: per-stratum keep rates (e.g. keep
    * 10% of English, 100% of the rare tail) with `defaultRate` for
    * unlisted strata. One narrow filter — the per-stratum cutoff is a
    * CASE over literals, no join, no shuffle, skew-immune.
    */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
      rates: Map[String, Double], defaultRate: Double,
      salt: String = "graft"): DataFrame = {
    val cutoff = rates.toSeq.sortBy(_._1).foldLeft(Option.empty[Column]) {
      case (acc, (s, r)) =>
        val c = lit(cutoffHex(r))
        Some(acc.fold(when(stratum === s, c))(_.when(stratum === s, c)))
    }.fold(lit(cutoffHex(defaultRate)))(_.otherwise(cutoffHex(defaultRate)))
    df.filter(unitHex(key, salt) < cutoff)
  }

  /** Deterministic MIXTURE RESAMPLING with repetition — the training-mix
    * reweighting trick ("see Wikipedia 3 epochs, downsample CommonCrawl to
    * 0.3"): every row of stratum `s` is emitted `rates(s)` times in
    * EXPECTATION — `floor(rate)` guaranteed copies plus one more iff the
    * key's hash draw falls under the fractional part. A rate <= 1 is a
    * plain stratified downsample; an integral rate is exact repetition.
    * Output carries `copy` (0-based repetition index) so downstream
    * shuffles and sequence packing treat repeats as distinct rows.
    *
    * Narrow and skew-immune like the rest of the family: rates are plan
    * literals, so the whole op is one CASE + one bounded explode — no
    * join, no shuffle, no RNG state; and the draw is a pure function of
    * (key, salt): stable under repartitioning/retries/accretion, exactly
    * reproducible cross-engine (q73).
    */
  def epochMix(df: DataFrame, key: Column, stratum: Column,
      rates: Map[String, Double], defaultRate: Double = 1.0,
      salt: String = "graft"): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0.0 && r <= 1000.0, s"rate must be in [0,1000]: $r"))
    def caseOver(f: Double => Column): Column =
      rates.toSeq.sortBy(_._1).foldLeft(Option.empty[Column]) {
        case (acc, (s, r)) =>
          Some(acc.fold(when(stratum === s, f(r)))(_.when(stratum === s, f(r))))
      }.fold(f(defaultRate))(_.otherwise(f(defaultRate)))
    val base = caseOver(r => lit(math.floor(r).toInt))
    // the fractional-copy cutoff is a per-stratum hex LITERAL (frac 0 =>
    // "00000000", which no draw is strictly below — never an extra copy)
    val extraCut = caseOver(r => lit(cutoffHex(r - math.floor(r))))
    val copies = base + when(unitHex(key, salt) < extraCut, 1).otherwise(0)
    df.withColumn("copy", explode(
      when(copies > 0, sequence(lit(0), copies - 1))
        .otherwise(array().cast("array<int>"))))
  }

  /** Deterministic per-group top-k: the k members of each group that sort
    * first in hash order (key tie-break) — a reproducible stand-in for
    * per-group reservoir sampling. Unlike a reservoir it is stable across
    * runs and engines. Costs one hash shuffle on the group key; heavy
    * groups sort-spill rather than OOM (window, not collect_list), and
    * rank-k cutoff means output is bounded at k per group regardless of
    * skew. Emits `rn` (1-based hash-order rank within the group).
    */
  def groupTopK(df: DataFrame, group: Column, key: Column, k: Int,
      salt: String = "graft"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val w = Window.partitionBy(group).orderBy(unitHex(key, salt).asc, key.asc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }
}
