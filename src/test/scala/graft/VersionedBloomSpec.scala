package graft

import java.nio.file.Files
import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Per-group bloom sidecars (the Iceberg Puffin analogue): equality
  * predicates on high-cardinality, NON-clustered keys must prune at the
  * manifest layer even though every file group's [min,max] spans the whole
  * keyspace (the case range stats can never prune). Fixtures use hash-coded
  * keys so the range-overlap precondition is asserted, not assumed —
  * every test first PROVES min/max alone would have kept all groups.
  */
class VersionedBloomSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-bloom-$name").resolve("t").toString

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Interleaved long id: consecutive (g, i) land far apart, so all four
    * groups' [min,max] cover nearly the same range.
    */
  private def vOf(g: Int, i: Int): Long = ((i * 4 + g) * 2654435761L) % 100000L

  private def grp(g: Int): DataFrame = {
    import spark.implicits._
    (0 until 100).map(i => (md5hex(s"$g-$i"), vOf(g, i))).toDF("k", "v").repartition(1)
  }

  /** 4 groups, blooms on both the string and the long key. */
  private def bloomTable(): String = {
    val p = tmp("t")
    VersionedTable.setBloomColumns(p, Seq("k", "v"), fpp = 0.001)
    VersionedTable.overwrite(grp(0), p)
    (1 to 3).foreach(g => VersionedTable.append(grp(g), p))
    p
  }

  /** Assert range stats alone could NOT have pruned `column` = `probe`:
    * every group's [min,max] must contain it.
    */
  private def assertRangesSpan(p: String, column: String, probe: String): Unit =
    VersionedTable.versions(p).last.dirs.foreach { d =>
      val cs = VersionedTable.groupStats(p, d).get.cols(column)
      assert(cs.min.get <= probe && probe <= cs.max.get,
        s"fixture broke: group $d range [${cs.min.get},${cs.max.get}] excludes $probe " +
          "— the test would pass on range stats alone")
    }

  test("string point lookup opens only the bloom-matching group") {
    val p = bloomTable()
    val probe = md5hex("2-50")
    assertRangesSpan(p, "k", probe)
    val (df, idx) = VersionedTable.scanIndexed(p)
    val got = df.where(col("k") === probe).collect()
    assert(got.length == 1 && got(0).getLong(1) == vOf(2, 50))
    assert(idx.lastKeptDirs.size == 1,
      s"bloom pruning regressed: kept ${idx.lastKeptDirs.size} of 4 groups")
  }

  test("integral point lookup prunes through the Long hashing domain") {
    val p = bloomTable()
    val probe = vOf(1, 33)
    // interleaving puts the probe inside every group's numeric range
    VersionedTable.versions(p).last.dirs.foreach { d =>
      val cs = VersionedTable.groupStats(p, d).get.cols("v")
      assert(BigDecimal(cs.min.get) <= probe && probe <= BigDecimal(cs.max.get))
    }
    val (df, idx) = VersionedTable.scanIndexed(p)
    assert(df.where(col("v") === probe).count() == 1)
    assert(idx.lastKeptDirs.size == 1)
  }

  test("a key absent from every group plans zero file groups") {
    val p = bloomTable()
    val probe = md5hex("never-inserted")
    assertRangesSpan(p, "k", probe)
    val (df, idx) = VersionedTable.scanIndexed(p)
    assert(df.where(col("k") === probe).count() == 0)
    assert(idx.lastKeptDirs.isEmpty)
  }

  test("IN over keys from two groups keeps exactly those two") {
    val p = bloomTable()
    val (df, idx) = VersionedTable.scanIndexed(p)
    val keys = Seq(md5hex("0-10"), md5hex("3-77"))
    assert(df.where(col("k").isin(keys: _*)).count() == 2)
    assert(idx.lastKeptDirs.size == 2)
  }

  test("pre-bloom groups keep conservatively; post-config commits prune") {
    val p = tmp("preconfig")
    VersionedTable.overwrite(grp(0), p)
    VersionedTable.append(grp(1), p)
    VersionedTable.setBloomColumns(p, Seq("k"), fpp = 0.001)
    VersionedTable.append(grp(2), p)
    val (df, idx) = VersionedTable.scanIndexed(p)
    // a key held only by a PRE-bloom group: group 2's bloom excludes it,
    // groups 0/1 keep for lack of evidence
    assert(df.where(col("k") === md5hex("0-5")).count() == 1)
    assert(idx.lastKeptDirs.size == 2)
    // a rewrite regenerates every group under the current config — the
    // same lookup now opens exactly one of the sorted groups
    VersionedTable.rewriteSorted(p, "k", targetGroups = 3)
    val (df2, idx2) = VersionedTable.scanIndexed(p)
    assert(df2.where(col("k") === md5hex("0-5")).count() == 1)
    assert(idx2.lastKeptDirs.size == 1)
  }

  test("row-level ops regenerate blooms on rewritten groups; values stay exact") {
    import spark.implicits._
    val p = bloomTable()
    val probe = md5hex("2-50")
    VersionedTable.merge(Seq((probe, 999999L)).toDF("k", "v"), p, "k")
    val (df, idx) = VersionedTable.scanIndexed(p)
    val got = df.where(col("k") === probe).collect()
    assert(got.length == 1 && got(0).getLong(1) == 999999L)
    // the merge batch's own group holds the probe now; the rewritten
    // remainder group excludes it via its regenerated bloom
    assert(idx.lastKeptDirs.size == 1)
    // full equality vs the manifest-resolved read after the merge
    assert(df.orderBy("k", "v").collect().toSeq ==
      VersionedTable.read(p).orderBy("k", "v").collect().toSeq)
  }

  test("unsupported literal shapes are no evidence (conservative)") {
    val p = bloomTable()
    val (df, idx) = VersionedTable.scanIndexed(p)
    val direct = df.where(col("v") === vOf(0, 0)).count()
    // arithmetic defeats attribute=literal extraction -> keep all, stay
    // exact (v < 100000, so the modulo is the identity but not foldable)
    assert(df.where(col("v") % 1000003L === vOf(0, 0)).count() == direct)
    assert(idx.lastKeptDirs.size == 4)
  }
}
