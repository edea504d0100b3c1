package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** ZORDER rewrite: multi-dimensional clustering must make a conjunctive
  * 2-D range predicate prune at the manifest layer — the query shape a
  * single-column sort structurally cannot serve (sorted by x, every group
  * spans all of y). Fixtures are a uniform 40×40 grid appended in
  * arrival order, so pre-rewrite stats can prune nothing on either axis
  * (asserted, not assumed).
  */
class ZOrderSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-zorder-$name").resolve("t").toString

  /** 16384 grid points (x, y) in [0,128)², appended as 4 interleaved
    * slices by (x + y) % 4 — every slice spans both full axes. 128 values
    * per axis >> 64 groups, so GROUP COUNT (not key cardinality) bounds
    * what any layout can isolate — a coarser grid hands the 1-D sort one
    * key per group and makes the comparison vacuous.
    */
  private def gridTable(): String = {
    import spark.implicits._
    val p = tmp("grid")
    val all = for { x <- 0 until 128; y <- 0 until 128 }
      yield (x.toLong, y.toLong, s"v$x-$y")
    def slice(k: Int): DataFrame =
      all.filter(t => (t._1 + t._2) % 4 == k).toDF("x", "y", "v").repartition(1)
    VersionedTable.overwrite(slice(0), p)
    (1 to 3).foreach(k => VersionedTable.append(slice(k), p))
    p
  }

  private def keptFor(p: String, cond: org.apache.spark.sql.Column): (Long, Int) = {
    val (df, idx) = VersionedTable.scanIndexed(p)
    val n = df.where(cond).count()
    (n, idx.lastKeptDirs.size)
  }

  private val box = col("x").between(0, 31) && col("y").between(0, 31)
  private val yBand = col("y").between(0, 31)

  test("z-order trades the sorted axis for pruning on BOTH axes") {
    val p = gridTable()
    val before = VersionedTable.versions(p).last

    // precondition: arrival-order groups span both axes -> nothing prunes
    val (n0, kept0) = keptFor(p, box)
    assert(n0 == 1024 && kept0 == 4)

    // 1-D sort by x, 64 groups: the x share of the box prunes (1/4 of the
    // keyspace -> ~16 groups) but a y-band is STRUCTURALLY a full scan —
    // every sorted group spans all of y
    VersionedTable.rewriteSorted(p, "x", targetGroups = 64)
    val sortGroups = VersionedTable.versions(p).last.dirs.size
    val (nb1, keptBoxSort) = keptFor(p, box)
    val (ny1, keptYSort) = keptFor(p, yBand)
    assert(nb1 == 1024 && ny1 == 4096)
    assert(keptBoxSort >= 14, s"x share of the box bounds the sort, kept $keptBoxSort")
    assert(keptYSort == sortGroups, s"sorted-by-x must full-scan a y-band, kept $keptYSort")

    // the z-order rewrite clusters BOTH axes: the quarter-by-quarter box
    // covers ~4 of the 64 z cells (2-3x Morton/sampling fragmentation
    // tolerated) and the y-band drops from all-64 to its cell share
    val v = VersionedTable.rewriteZOrder(p, Seq("x", "y"), targetGroups = 64)
    assert(v.snapshotId == before.snapshotId) // content-identity gate held
    val (nb2, keptBoxZ) = keptFor(p, box)
    val (ny2, keptYZ) = keptFor(p, yBand)
    assert(nb2 == 1024 && ny2 == 4096)
    assert(keptBoxZ < keptBoxSort, s"box: z kept $keptBoxZ, sort kept $keptBoxSort")
    assert(keptBoxZ <= 12, s"box: z-order should isolate ~4 cells, kept $keptBoxZ")
    assert(keptYZ <= 32, s"y-band: z kept $keptYZ of 64 (sort kept all $sortGroups)")

    // full content still exact vs a fresh re-derivation
    assert(VersionedTable.read(p).orderBy("x", "y").collect().toSeq ==
      VersionedTable.readAsOf(p, before.seq).orderBy("x", "y").collect().toSeq)
  }

  test("timestamp dimensions cluster; unsupported types throw, never degrade") {
    import spark.implicits._
    val p = tmp("ts")
    // independent axes (a y correlated with ts scatters the 2-D structure
    // and nothing can cluster it): 20 days x 20 y values
    val rows = (0 until 400).map { i =>
      (new java.sql.Timestamp(1700000000000L + (i % 20) * 86400000L),
        (i / 20).toLong, i % 2 == 0)
    }
    VersionedTable.overwrite(rows.toDF("ts", "y", "flag").repartition(1), p)
    VersionedTable.append(rows.toDF("ts", "y", "flag").repartition(1), p)
    val before = VersionedTable.versions(p).last
    val v = VersionedTable.rewriteZOrder(p, Seq("ts", "y"), targetGroups = 8)
    assert(v.snapshotId == before.snapshotId)
    val (df, idx) = VersionedTable.scanIndexed(p)
    val lo = new java.sql.Timestamp(1700000000000L)
    val hiT = new java.sql.Timestamp(1700000000000L + 4L * 86400000L)
    assert(df.where(col("ts").between(lo, hiT)).count() == 200)
    assert(idx.lastKeptDirs.size < 8, s"ts band kept ${idx.lastKeptDirs.size}")
    // a boolean dimension would silently degenerate the curve — it throws
    val e = intercept[IllegalArgumentException](
      VersionedTable.rewriteZOrder(p, Seq("flag", "y"), targetGroups = 8))
    assert(e.getMessage.contains("unsupported type"))
  }

  test("string dimension, null keys and history kind") {
    import spark.implicits._
    val p = tmp("strnull")
    val rows = (0 until 300).map { i =>
      val key = if (i % 29 == 0) null else f"${('a' + i % 26).toChar}%c${i}%03d"
      (key, (i % 50).toLong, i.toLong)
    }
    VersionedTable.overwrite(rows.toDF("k", "y", "id").repartition(1), p)
    VersionedTable.append(
      (300 until 600).map(i => (f"${('a' + i % 26).toChar}%c${i}%03d", (i % 50).toLong, i.toLong))
        .toDF("k", "y", "id").repartition(1), p)
    val before = VersionedTable.versions(p).last
    val v = VersionedTable.rewriteZOrder(p, Seq("k", "y"), targetGroups = 8)
    assert(v.snapshotId == before.snapshotId)
    val h = VersionedTable.history(p).orderBy(desc("version"))
      .select("operation").collect()(0).getString(0)
    assert(h == "rewrite")
    // nulls survive the rewrite and a prefix probe stays exact + pruned
    assert(VersionedTable.read(p).where(col("k").isNull).count() ==
      rows.count(_._1 == null))
    val (df, idx) = VersionedTable.scanIndexed(p)
    val got = df.where(col("k").startsWith("m")).count()
    assert(got == (0 until 600).count(i => i % 26 == 12 && !(i < 300 && i % 29 == 0)))
    assert(idx.lastKeptDirs.size < 8, s"prefix probe kept ${idx.lastKeptDirs.size}")
  }
}
