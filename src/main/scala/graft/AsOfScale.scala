package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.GraphQuery

/** Scale evidence for GraphQuery.asOfJoin: the union-tag/window form (one
  * shuffle, zero pair explosion) vs the naive range-join + per-left-row
  * argmax — the plan a straight SQL translation would produce. Both sides
  * compute identical matches (asserted row-for-row via checksum), on a
  * synthetic workload whose per-key row counts mirror a fact×fact
  * temporal alignment: K keys × L left rows/key × R right rows/key, so
  * the naive intermediate is L×R per key while the window form stays
  * L+R. Interleaved A/B, min-of-reps. Usage:
  *   SPARK_GRAFT_ASOF_KEYS=2000 SPARK_GRAFT_ASOF_LEFT=500 \
  *   SPARK_GRAFT_ASOF_RIGHT=500 runMain graft.AsOfScale
  */
object AsOfScale {
  def main(args: Array[String]): Unit = {
    val keys = sys.env.getOrElse("SPARK_GRAFT_ASOF_KEYS", "2000").toInt
    val perLeft = sys.env.getOrElse("SPARK_GRAFT_ASOF_LEFT", "500").toInt
    val perRight = sys.env.getOrElse("SPARK_GRAFT_ASOF_RIGHT", "500").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      appName = "graft-asof-scale")
    spark.sparkContext.setLogLevel("WARN")

    // deterministic synthetic streams: left ts stride 7, right stride 11
    // (hash-free, so the match structure is reproducible run to run)
    def side(perKey: Int, stride: Int, tag: String): DataFrame =
      spark.range(keys.toLong * perKey)
        .select(
          (col("id") % keys).as("k"),
          ((col("id") / keys) * stride + length(lit(tag))).as("ts"),
          (col("id") % 9973).cast("double").as("v"))
        .localCheckpoint() // time the join, not the generator

    val left = side(perLeft, 7, "le")
    val right = side(perRight, 11, "r")
    val nL = left.count(); val nR = right.count()

    def windowed(): DataFrame =
      GraphQuery.asOfJoin(left.withColumnRenamed("v", "lv"), right,
        Seq("k"), "ts", Seq("v"))

    def naive(): DataFrame = {
      val l = left.withColumnRenamed("v", "lv")
        .withColumn("lid", monotonically_increasing_id())
      val r = right.select(col("k").as("rk"), col("ts").as("r_ts"),
        col("v").as("r_v"))
      val m = l.join(r, col("k") === col("rk") && col("r_ts") <= col("ts"))
        .groupBy(col("lid").as("mlid"))
        .agg(max(struct(col("r_ts"), col("r_v"))).as("m"))
      l.join(m, col("lid") === col("mlid"), "left")
        .select(col("k"), col("ts"), col("lv"),
          col("m.r_ts").as("r_ts"), col("m.r_v").as("r_v"))
    }

    // content checksum over the full match relation — any divergence in
    // any matched row flips it
    def checksum(df: DataFrame): (Long, Long) = {
      val r = df.select(
        count(lit(1)).as("n"),
        sum(hash(col("k"), col("ts"), col("lv"), col("r_ts"), col("r_v"))
          .cast("long")).as("h")).head()
      (r.getLong(0), r.getLong(1))
    }

    var best = (Double.MaxValue, Double.MaxValue)
    for (rep <- 1 to reps) {
      val (cw, tw) = Bench.time(checksum(windowed()))
      val (cn, tn) = Bench.time(checksum(naive()))
      require(cw == cn, s"as-of divergence: windowed=$cw naive=$cn")
      best = (math.min(best._1, tw), math.min(best._2, tn))
      println(f"[asof] rep=$rep left=$nL right=$nR rows=${cw._1} " +
        f"windowed=$tw%6.2f s naive=$tn%6.2f s speedup=${tn / tw}%5.1fx")
    }
    println(f"[asof] BEST windowed=${best._1}%6.2f s naive=${best._2}%6.2f s " +
      f"speedup=${best._2 / best._1}%5.1fx " +
      f"(naive intermediate ≈ ${keys.toLong * perLeft * perRight / 2}%,d rows)")
    spark.stop()
  }
}
