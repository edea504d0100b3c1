package graft

import org.apache.spark.sql.functions._

/** Diagnostic: scaling of a vectorized-parquet-scan + codegen aggregation
  * (low allocation) vs the allocation-heavy row pipeline. On this sandbox
  * host, memory-dirtying work serializes at the hypervisor level; this
  * probe shows which workload classes still scale.
  */
object ScanScale {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Seq(8, 32).foreach { cores =>
      val spark = Sessions.local(cores, appName = s"scan-$cores")
      spark.sparkContext.setLogLevel("WARN")
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val big = (1 to 16).map(_ => li).reduce(_ union _) // ~9.6M rows
      big.count() // warm page cache + codegen
      val t0 = System.nanoTime()
      val r = big.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity") * (lit(1) - col("l_discount")) * col("l_extendedprice")).as("x"),
          count(lit(1)).as("c"))
        .collect()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[scan] cores=$cores sec=$sec%.2f rows=${r.map(_.getLong(3)).sum}")
      spark.stop()
    }
  }
}
