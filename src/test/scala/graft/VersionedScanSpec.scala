package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** The FileIndex seam: plain declarative filters over `VersionedTable.scan`
  * must (a) return exactly what a full merged read returns, and (b) plan
  * only the file groups whose manifest stats can match — manifest-level
  * file skipping driven by Catalyst's own pushed-down data filters, with
  * the skipped-group count asserted from the executed plan's numFiles
  * metric, not inferred from timing.
  */
class VersionedScanSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-vscan-$name").resolve("t").toString

  /** Four range-disjoint appends over id: [0,99], [100,199], [200,299],
    * [300,399]; each group carries one parquet file (repartition(1)).
    */
  private def rangedTable(): String = {
    import spark.implicits._
    val p = tmp("ranged")
    def slice(lo: Int): DataFrame =
      (lo until lo + 100).map(i => (i.toLong, s"name$i", i % 7)).toDF("id", "name", "grp")
        .repartition(1)
    VersionedTable.overwrite(slice(0), p)
    (1 to 3).foreach(k => VersionedTable.append(slice(k * 100), p))
    p
  }

  private def numFilesPlanned(df: DataFrame): Long = {
    df.collect() // metrics populate on execution
    val scans = df.queryExecution.executedPlan.collect { case s: FileSourceScanExec => s }
    assert(scans.size == 1)
    scans.head.metrics("numFiles").value
  }

  test("a plain between filter over scan opens only the matching file group") {
    val p = rangedTable()
    val (df, idx) = VersionedTable.scanIndexed(p)
    val q = df.where(col("id").between(150, 180))
    assert(numFilesPlanned(q) == 1)
    assert(idx.lastKeptDirs.size == 1)
    // value-exact vs the full merged read under the same predicate
    val full = VersionedTable.read(p).where(col("id").between(150, 180))
    assert(q.orderBy("id").collect().toSeq == full.orderBy("id").collect().toSeq)
    assert(q.count() == 31)
  }

  test("spark.sql over a temp view gets the same manifest-level skipping") {
    val p = rangedTable()
    val (df, idx) = VersionedTable.scanIndexed(p)
    df.createOrReplaceTempView("vscan_t")
    val q = spark.sql("SELECT sum(id) AS s FROM vscan_t WHERE id >= 300")
    assert(q.collect()(0).getLong(0) == (300L to 399L).sum)
    assert(idx.lastKeptDirs.size == 1)
  }

  test("an equality far outside every range plans zero files") {
    val p = rangedTable()
    val (df, idx) = VersionedTable.scanIndexed(p)
    val q = df.where(col("id") === 5000)
    assert(q.count() == 0)
    assert(idx.lastKeptDirs.isEmpty)
  }

  test("an OR spanning two ranges keeps exactly those two groups") {
    val p = rangedTable()
    val (df, idx) = VersionedTable.scanIndexed(p)
    val q = df.where(col("id") === 50 || col("id") === 350)
    assert(q.count() == 2)
    assert(idx.lastKeptDirs.size == 2)
  }

  test("string bounds prune in UTF-8 byte order, and startsWith prunes") {
    import spark.implicits._
    val p = tmp("strings")
    VersionedTable.overwrite(
      Seq(("apple", 1L), ("banana", 2L)).toDF("k", "v").repartition(1), p)
    VersionedTable.append(
      Seq(("melon", 3L), ("peach", 4L)).toDF("k", "v").repartition(1), p)
    val (df, idx) = VersionedTable.scanIndexed(p)
    assert(df.where(col("k") > "z").count() == 0)
    assert(idx.lastKeptDirs.isEmpty)
    assert(df.where(col("k") === "melon").count() == 1)
    assert(idx.lastKeptDirs.size == 1)
    assert(df.where(col("k").startsWith("ba")).count() == 1)
    assert(idx.lastKeptDirs.size == 1)
    // a prefix past every group's range prunes everything
    assert(df.where(col("k").startsWith("zz")).count() == 0)
    assert(idx.lastKeptDirs.isEmpty)
  }

  test("filters the stats cannot reason about keep every group (conservative)") {
    val p = rangedTable()
    val (df, idx) = VersionedTable.scanIndexed(p)
    // arithmetic over the column defeats min/max reasoning -> no skipping,
    // but results stay exact
    val q = df.where(col("id") % 100 === 50)
    assert(q.count() == 4)
    assert(idx.lastKeptDirs.size == 4)
  }

  test("IsNotNull skips an all-null group; schema-evolved column skips old groups") {
    import spark.implicits._
    val p = tmp("evolve")
    VersionedTable.overwrite(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").repartition(1), p)
    VersionedTable.append(
      Seq((null.asInstanceOf[java.lang.Long], "x")).toDF("id", "v").repartition(1), p)
    // add-column evolution: only the newest group carries `extra`
    VersionedTable.append(
      Seq((10L, "c", 99L)).toDF("id", "v", "extra").repartition(1), p)
    val (df, idx) = VersionedTable.scanIndexed(p)
    assert(df.columns.toSet == Set("id", "v", "extra"))
    // id IS NOT NULL proves the all-null group away
    df.where(col("id").isNotNull).collect()
    assert(idx.lastKeptDirs.size == 2)
    // a predicate on the evolved column skips groups that lack it entirely
    assert(df.where(col("extra") === 99).count() == 1)
    assert(idx.lastKeptDirs.size == 1)
    // full scan equality vs the mergeSchema read
    assert(df.orderBy(col("v")).collect().toSeq ==
      VersionedTable.read(p).select("id", "v", "extra").orderBy(col("v")).collect().toSeq)
  }

  test("count(*)/min/max answer from manifest stats alone — no file scan planned") {
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    import org.apache.spark.sql.DataFrame
    import spark.implicits._
    def folded(df: DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collect { case l: LocalRelation => l }.nonEmpty
    val p = rangedTable()
    val df = spark.read.format("graft-versioned").load(p)
    df.createOrReplaceTempView("vcount_t")
    val q = spark.sql("SELECT count(*) AS n FROM vcount_t")
    assert(q.as[Long].collect()(0) == 400L)
    assert(folded(q), q.queryExecution.optimizedPlan.toString)
    // the watermark query of every incremental pipeline: one metadata row
    val mm = spark.sql("SELECT min(id) AS lo, max(id) AS hi, max(name) AS mx, count(*) AS n FROM vcount_t")
    assert(mm.collect()(0).toSeq == Seq(0L, 399L, "name99", 400L))
    assert(folded(mm), mm.queryExecution.optimizedPlan.toString)
    // a filter defeats the metadata answer but stays correct via the scan
    val f = spark.sql("SELECT count(*) AS n FROM vcount_t WHERE id >= 100")
    assert(f.as[Long].collect()(0) == 300L)
    assert(!folded(f))
    // count(col) needs null counts the stats lack — falls back to the scan
    val c = spark.sql("SELECT count(id) AS n FROM vcount_t")
    assert(c.as[Long].collect()(0) == 400L)
    assert(!folded(c))
    // min over a computed expression cannot come from stats
    val e = spark.sql("SELECT min(id + 1) AS n FROM vcount_t")
    assert(e.as[Long].collect()(0) == 1L)
    assert(!folded(e))
    // all-null and schema-evolved groups: min skips them, count includes
    val p2 = tmp("aggnull")
    VersionedTable.overwrite(
      Seq((1L, "a"), (9L, "b")).toDF("id", "v").repartition(1), p2)
    VersionedTable.append(
      Seq((null.asInstanceOf[java.lang.Long], "x")).toDF("id", "v").repartition(1), p2)
    VersionedTable.append(Seq((4L, "c", 2L)).toDF("id", "v", "extra").repartition(1), p2)
    val df2 = spark.read.format("graft-versioned").load(p2)
    df2.createOrReplaceTempView("vagg_t")
    val m2 = spark.sql("SELECT min(id) AS lo, max(extra) AS hx, count(*) AS n FROM vagg_t")
    assert(m2.collect()(0).toSeq == Seq(1L, 2L, 4L))
    assert(folded(m2), m2.queryExecution.optimizedPlan.toString)
    // the watermark query over a TIMESTAMP axis folds too (stats carry
    // epoch micros — Catalyst's own internal value)
    val p3 = tmp("aggts")
    def ts(i: Long) = new java.sql.Timestamp(1700000000000L + i * 1000L)
    VersionedTable.overwrite(
      Seq((1L, ts(10)), (2L, ts(500))).toDF("id", "ts").repartition(1), p3)
    VersionedTable.append(
      Seq((3L, ts(2)), (4L, ts(300))).toDF("id", "ts").repartition(1), p3)
    spark.read.format("graft-versioned").load(p3).createOrReplaceTempView("vts_t")
    val m3 = spark.sql("SELECT min(ts) AS lo, max(ts) AS hi, count(*) AS n FROM vts_t")
    assert(m3.collect()(0).toSeq == Seq(ts(2), ts(500), 4L))
    assert(folded(m3), m3.queryExecution.optimizedPlan.toString)
  }

  test("the sidecar names the data files — planning needs no directory listing") {
    import spark.implicits._
    val p = tmp("namedfiles")
    VersionedTable.overwrite(
      (1L to 50L).map(i => (i, s"v$i")).toDF("id", "v").repartition(2), p)
    val dir = VersionedTable.versions(p).last.dirs.head
    val named = VersionedTable.groupStats(p, dir).flatMap(_.files)
    assert(named.isDefined && named.get.size == 2, s"sidecar files: $named")
    // the named set matches reality (names + sizes), and the scan planned
    // from it reads correctly
    val listed = java.nio.file.Files.list(java.nio.file.Paths.get(p, dir))
    val real = try {
      import scala.jdk.CollectionConverters._
      listed.iterator().asScala.filter { f =>
        val n = f.getFileName.toString
        !n.startsWith("_") && !n.startsWith(".")
      }
        .map(f => (f.getFileName.toString, java.nio.file.Files.size(f))).toSet
    } finally listed.close()
    assert(named.get.toSet == real)
    // content aggregate, NOT count(*): the ManifestAggRule answers a bare
    // count from the sidecar without opening a file, which would let a
    // corrupt `files` entry pass — sum(id) forces a real read through the
    // manifest-named file list
    assert(VersionedTable.scan(p).agg(sum("id")).collect()(0).getLong(0) == 1275L)
    assert(VersionedTable.scan(p).count() == 50)
  }

  test("spark.read.format(graft-versioned) reads, prunes, and time-travels") {
    import spark.implicits._
    val p = rangedTable()
    val df = spark.read.format("graft-versioned").load(p)
    // full read equality vs the manifest-resolved read
    assert(df.orderBy("id").collect().toSeq ==
      VersionedTable.read(p).orderBy("id").collect().toSeq)
    // the declarative filter prunes through the same FileIndex seam —
    // numFiles from the executed plan, each group wrote exactly one file
    assert(numFilesPlanned(df.where(col("id").between(250, 260))) == 1)
    // time travel: v1 held only the first slice
    val v1 = spark.read.format("graft-versioned").option("versionAsOf", 1).load(p)
    assert(v1.select(max(col("id"))).as[Long].collect()(0) == 99L)
    assert(v1.count() == 100)
    // an unretained version errors loudly
    intercept[IllegalArgumentException] {
      spark.read.format("graft-versioned").option("versionAsOf", 99).load(p).count()
    }
  }

  test("CREATE TEMPORARY VIEW ... USING graft-versioned works from pure SQL") {
    import spark.implicits._
    val p = rangedTable()
    spark.sql(
      s"CREATE OR REPLACE TEMPORARY VIEW vddl_t USING `graft-versioned` OPTIONS (path '$p')")
    assert(spark.sql("SELECT count(*) AS n FROM vddl_t").as[Long].collect()(0) == 400L)
    assert(spark.sql("SELECT sum(id) AS s FROM vddl_t WHERE id BETWEEN 100 AND 199")
      .as[Long].collect()(0) == (100L to 199L).sum)
  }

  test("history infers commit kinds from manifest evidence") {
    import spark.implicits._
    def mk(lo: Int, hi: Int) =
      (lo to hi).map(i => (i.toLong, s"n$i")).toDF("id", "name").repartition(1)
    val p = tmp("history")
    VersionedTable.overwrite(mk(1, 20), p)
    VersionedTable.append(mk(21, 30), p)
    // delete scoped to group 1 only: group 2 carries over -> rowlevel
    // (on a single-group table a delete rewrites everything and reads
    // "overwrite" — by dirs alone the two are genuinely the same commit)
    VersionedTable.deleteRange(p, "id", 5L, 9L)
    VersionedTable.compact(p)
    VersionedTable.overwrite(mk(50, 52), p)
    val h = VersionedTable.history(p)
      .orderBy("version").select("version", "n_rows", "operation")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSeq
    assert(h == Seq((1, 20L, "base"), (2, 30L, "append"), (3, 25L, "rowlevel"),
      (4, 25L, "rewrite"), (5, 3L, "overwrite")))
  }

  test("readChangesBetween delivers exactly the appended rows, skipping rewrites") {
    import spark.implicits._
    def mk(lo: Int, hi: Int) =
      (lo to hi).map(i => (i.toLong, s"n$i")).toDF("id", "name").repartition(1)
    val p = tmp("changes")
    VersionedTable.overwrite(mk(1, 20), p)   // v1
    VersionedTable.append(mk(21, 30), p)     // v2
    VersionedTable.compact(p)                // v3: layout-only, no new rows
    VersionedTable.append(mk(31, 45), p)     // v4
    def ids(from: Int, to: Int) =
      VersionedTable.readChangesBetween(p, from, to)
        .select("id").as[Long].collect().sorted.toSeq
    assert(ids(1, 2) == (21L to 30L))
    assert(ids(1, 4) == (21L to 45L)) // compaction contributes nothing
    assert(ids(2, 4) == (31L to 45L)) // ...even as the walk's start frontier
    assert(ids(3, 4) == (31L to 45L))
    assert(ids(4, 4) == Seq.empty)
    // the delta prunes through the same FileIndex seam as batch scans
    assert(VersionedTable.readChangesBetween(p, 1, 4)
      .where(col("id") === 35).count() == 1)
    // a data rewrite inside the range fails loudly
    VersionedTable.deleteRange(p, "id", 5L, 9L) // v5
    val e = intercept[IllegalStateException](ids(1, 5))
    assert(e.getMessage.contains("rewrote data"))
    // ...but a range that stops before it still answers
    assert(ids(1, 4) == (21L to 45L))
    // an expired endpoint fails loudly too
    VersionedTable.expire(p, keep = 2)
    intercept[IllegalArgumentException](ids(1, 4))
    // schema evolution: the delta surfaces the evolved column (the range
    // starts AFTER the v5 delete — crossing it would rightly throw)
    VersionedTable.append(mk(200, 205), p)                                     // v6
    VersionedTable.append(Seq((100L, "x", 7L)).toDF("id", "name", "extra"), p) // v7
    val d = VersionedTable.readChangesBetween(p, 5, 7)
    assert(d.columns.toSet == Set("id", "name", "extra"))
    assert(d.count() == 7) // v6's six rows + v7's one
    assert(d.where(col("extra").isNotNull).count() == 1)
  }

  test("tags survive expire and time-travel by name (Iceberg ref semantics)") {
    import spark.implicits._
    def mk(lo: Int, hi: Int) =
      (lo to hi).map(i => (i.toLong, s"n$i")).toDF("id", "name").repartition(1)
    val p = tmp("tags")
    VersionedTable.overwrite(mk(1, 10), p)  // v1
    VersionedTable.append(mk(11, 20), p)    // v2 <- published
    VersionedTable.append(mk(21, 30), p)    // v3
    VersionedTable.append(mk(31, 40), p)    // v4
    VersionedTable.tag(p, "published", 2)
    // tagging an unretained version fails loudly
    intercept[IllegalArgumentException](VersionedTable.tag(p, "x", 99))
    val publishedRows = VersionedTable.readAsOf(p, 2).orderBy("id").collect().toSeq
    // retention would drop v1-v3, but the tag protects v2 (and its dirs)
    val expired = VersionedTable.expire(p, keep = 1)
    assert(VersionedTable.versions(p).map(_.seq) == Seq(2, 4))
    intercept[IllegalArgumentException](VersionedTable.readAsOf(p, 3))
    assert(VersionedTable.readAsOfTag(p, "published").orderBy("id").collect().toSeq
      == publishedRows)
    // the tag also resolves through the format reader
    assert(spark.read.format("graft-versioned").option("tagAsOf", "published")
      .load(p).count() == 20)
    // v2's dirs must not have been deleted by the expire
    assert(expired.forall(d => !VersionedTable.versions(p)
      .find(_.seq == 2).get.dirs.contains(d)))
    // dropping the tag releases the version at the next retention pass
    VersionedTable.dropTag(p, "published")
    VersionedTable.expire(p, keep = 1)
    assert(VersionedTable.versions(p).map(_.seq) == Seq(4))
    intercept[IllegalArgumentException](VersionedTable.readAsOfTag(p, "published"))
    // the tip is untouched throughout
    assert(VersionedTable.read(p).count() == 40)
  }

  test("the appended-rows walk refuses tag-created history gaps") {
    import spark.implicits._
    def mk(lo: Int, hi: Int) =
      (lo to hi).map(i => (i.toLong, s"n$i")).toDF("id", "name").repartition(1)
    val p = tmp("gap")
    VersionedTable.overwrite(mk(1, 10), p) // v1, tagged
    VersionedTable.append(mk(11, 20), p)   // v2 (will expire)
    VersionedTable.append(mk(21, 30), p)   // v3
    VersionedTable.tag(p, "base", 1)
    VersionedTable.expire(p, keep = 1)     // retained: {1 (tagged), 3}
    assert(VersionedTable.versions(p).map(_.seq) == Seq(1, 3))
    // v1 -> v3 skips the expired v2: the step is unclassifiable (a data
    // rewrite could hide in the gap) — loud refusal, not silent delivery
    val e = intercept[IllegalStateException](
      VersionedTable.readChangesBetween(p, 1, 3).count())
    assert(e.getMessage.contains("expired"))
    // the empty tag name would write a ref the reader can never resolve
    intercept[IllegalArgumentException](VersionedTable.tag(p, "", 1))
    // reading full snapshots across the gap stays fine
    assert(VersionedTable.readAsOfTag(p, "base").count() == 10)
    assert(VersionedTable.read(p).count() == 30)
  }

  test("rollback makes an old version the tip as a NEW auditable commit") {
    import spark.implicits._
    def mk(lo: Int, hi: Int) =
      (lo to hi).map(i => (i.toLong, s"n$i")).toDF("id", "name").repartition(1)
    val p = tmp("rollback")
    val v1 = VersionedTable.overwrite(mk(1, 20), p) // v1 <- good emit
    VersionedTable.append(mk(21, 30), p)            // v2 <- bad emit
    // rolling back to the tip is a no-op, not an empty commit
    assert(VersionedTable.rollbackTo(p, 2).seq == 2)
    assert(VersionedTable.versions(p).size == 2)
    // the real rollback: v3 carries v1's dirs + snapshot id by reference
    val v3 = VersionedTable.rollbackTo(p, 1)
    assert(v3.seq == 3 && v3.snapshotId == v1.snapshotId && v3.dirs == v1.dirs)
    assert(VersionedTable.read(p).count() == 20)
    // history is intact (the undone v2 stays time-travelable) and the
    // rollback itself is labeled
    assert(VersionedTable.readAsOf(p, 2).count() == 30)
    val ops = VersionedTable.history(p).orderBy("version")
      .select("operation").as[String].collect().toSeq
    assert(ops == Seq("base", "append", "rollback"))
    // an unretained target fails loudly
    intercept[IllegalArgumentException](VersionedTable.rollbackTo(p, 99))
    // roll FORWARD works too (v2 is still retained), via a tag this time
    VersionedTable.tag(p, "bad", 2)
    assert(VersionedTable.rollbackToTag(p, "bad").snapshotId
      == VersionedTable.versions(p).find(_.seq == 2).get.snapshotId)
    assert(VersionedTable.read(p).count() == 30)
    VersionedTable.dropTag(p, "bad")
    // after expire-to-1 the tip (a rollback commit) still reads: its dirs
    // are referenced by the retained version, so expire must not drop them
    VersionedTable.rollbackTo(p, 3) // back to the 20-row state (v5)
    VersionedTable.expire(p, keep = 1)
    assert(VersionedTable.versions(p).map(_.seq) == Seq(5))
    assert(VersionedTable.read(p).orderBy("id").as[(Long, String)].collect().toSeq
      == (1L to 20L).map(i => (i, s"n$i")))
  }

  test("filesMetadata and refs answer from the manifest alone") {
    import spark.implicits._
    val p = rangedTable() // 4 groups x 100 rows, one file each
    val fm = VersionedTable.filesMetadata(p)
    assert(fm.columns.toSeq == Seq(
      "file_group", "file", "bytes", "group_rows", "group_snapshot_id"))
    val rows = fm.collect()
    assert(rows.length == 4) // one parquet file per repartition(1) group
    assert(rows.forall(r => r.getLong(2) > 0 && r.getLong(3) == 100L))
    assert(rows.map(_.getString(0)).distinct.length == 4)
    // group sids sum (mod 2^64) to the table's content snapshot id
    assert(rows.map(_.getLong(4)).sum == VersionedTable.versions(p).last.snapshotId)
    // asOf sees the historical layout
    assert(VersionedTable.filesMetadata(p, asOf = Some(1)).count() == 1)
    // refs mirrors the tag map
    VersionedTable.tag(p, "published", 2)
    assert(VersionedTable.refs(p).as[(String, Int)].collect().toSeq
      == Seq(("published", 2)))
  }

  test("scan sees exactly the latest committed version (row-level ops included)") {
    import spark.implicits._
    val p = tmp("rowops")
    VersionedTable.overwrite(
      (1L to 50L).map(i => (i, s"v$i")).toDF("id", "v").repartition(1), p)
    VersionedTable.deleteRange(p, "id", 10L, 19L)
    VersionedTable.merge(Seq((1L, "MERGED"), (200L, "NEW")).toDF("id", "v"), p, "id")
    val got = VersionedTable.scan(p).orderBy("id").as[(Long, String)].collect().toSeq
    val want = VersionedTable.read(p).orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == want)
    assert(got.size == 41) // 50 - 10 deleted + 1 insert; the merge hit replaces in place
    assert(got.head == (1L, "MERGED") && got.last == (200L, "NEW"))
  }
}
