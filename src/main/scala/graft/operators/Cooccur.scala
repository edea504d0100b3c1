package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Co-occurrence edge construction — the relatedness-edge builder of a KG
  * pipeline: items (skills, entities, parts) that appear together in the
  * same group (conversation, posting, order) get an undirected counted
  * edge, with both marginals carried so downstream can score PMI/lift
  * without a second pass over the facts.
  *
  * Scale shape at 10^12 facts: one distinct on (group, item), one
  * SELF-JOIN keyed on the group id — per-group fanout is quadratic in
  * GROUP size, not corpus size, so the join is safe exactly when group
  * sizes are bounded. That bound is enforced, not assumed: a group-size
  * census runs first (the same guard as Dedup's banded-LSH bucket cap)
  * and groups above `maxGroupSize` are excluded from pairing — and stay
  * OBSERVABLE via [[oversized]], never silently vanished (a stopword-like
  * item that lands in every group would otherwise quadratically dominate
  * the shuffle). Pair counts then aggregate on the (item_a, item_b) key
  * and the item marginals broadcast-join back on.
  */
object Cooccur {

  private def groupItems(df: DataFrame, group: Column, item: Column): DataFrame =
    df.select(group.as("g"), item.as("i"))
      .where(col("g").isNotNull && col("i").isNotNull).distinct()

  /** Groups whose item count exceeds `maxGroupSize` — the ones [[edges]]
    * excluded from pairing, with their sizes, so recall loss is auditable.
    */
  def oversized(df: DataFrame, group: Column, item: Column,
      maxGroupSize: Int): DataFrame =
    groupItems(df, group, item).groupBy(col("g").as("group"))
      .agg(count(lit(1)).as("n_items"))
      .filter(col("n_items") > maxGroupSize)

  /** Undirected co-occurrence edges (item_a < item_b) with group counts
    * and marginals: n_both = groups containing both (capped groups
    * excluded), n_a / n_b = TRUE per-item marginals over all groups
    * (cap-independent — the denominators of any PMI/lift downstream
    * shouldn't shift because a hot group was excluded from pairing).
    * All-integer output — exact cross-engine (q78).
    */
  def edges(df: DataFrame, group: Column, item: Column, minBoth: Long = 1L,
      maxGroupSize: Int = 1000): DataFrame = {
    val gi = groupItems(df, group, item)
    val sized = gi.join(
      gi.groupBy("g").agg(count(lit(1)).as("gsz")).filter(col("gsz") <= maxGroupSize),
      Seq("g"))
    val pairs = sized.as("a")
      .join(sized.as("b"), col("a.g") === col("b.g") && col("a.i") < col("b.i"))
      .groupBy(col("a.i").as("item_a"), col("b.i").as("item_b"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minBoth)
    val marg = gi.groupBy(col("i")).agg(count(lit(1)).as("n"))
    pairs
      .join(marg.select(col("i").as("item_a"), col("n").as("n_a")), Seq("item_a"))
      .join(marg.select(col("i").as("item_b"), col("n").as("n_b")), Seq("item_b"))
      .select("item_a", "item_b", "n_both", "n_a", "n_b")
  }
}
