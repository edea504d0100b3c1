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

  /** 1600 grid points (x, y) in [0,40)², appended as 4 interleaved slices
    * by (x + y) % 4 — every slice spans both full axes.
    */
  private def gridTable(): String = {
    import spark.implicits._
    val p = tmp("grid")
    val all = for { x <- 0 until 40; y <- 0 until 40 }
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

  private val box = col("x").between(0, 9) && col("y").between(0, 9)

  test("z-order makes a 2-D box prune; a 1-D sort cannot") {
    val p = gridTable()
    val before = VersionedTable.versions(p).last

    // precondition: arrival-order groups span both axes -> nothing prunes
    val (n0, kept0) = keptFor(p, box)
    assert(n0 == 100 && kept0 == 4)

    // a sort by x isolates the x range but every group spans all of y:
    // x in [0,9] is 1/4 of the keyspace -> 4 of 16 groups, best case
    VersionedTable.rewriteSorted(p, "x", targetGroups = 16)
    val (n1, kept1) = keptFor(p, box)
    assert(n1 == 100)
    assert(kept1 >= 4, s"sorted layout cannot beat the x-range share, kept $kept1")

    // the z-order rewrite clusters BOTH axes: the [0,9]^2 box is 1/16 of
    // the area and z-contiguous -> strictly fewer groups than the sort
    val v = VersionedTable.rewriteZOrder(p, Seq("x", "y"), targetGroups = 16)
    assert(v.snapshotId == before.snapshotId) // content-identity gate held
    val (n2, kept2) = keptFor(p, box)
    assert(n2 == 100)
    assert(kept2 < kept1, s"z-order kept $kept2, sort kept $kept1")
    assert(kept2 <= 2, s"z-order should isolate the origin box, kept $kept2")

    // full content still exact vs a fresh re-derivation
    assert(VersionedTable.read(p).orderBy("x", "y").collect().toSeq ==
      VersionedTable.readAsOf(p, before.seq).orderBy("x", "y").collect().toSeq)
  }

  test("both z-ordered axes prune independently too") {
    val p = gridTable()
    VersionedTable.rewriteZOrder(p, Seq("x", "y"), targetGroups = 16)
    // a y-only band: z-order gives PARTIAL locality on each axis — must
    // beat the no-layout 16-group full keep, exactness unchanged
    val (n, kept) = keptFor(p, col("y").between(0, 4))
    assert(n == 200)
    assert(kept < 16, s"y-band kept $kept of 16")
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
