package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Column-mapping schema evolution (rename/drop): metadata-only commits
  * that never rewrite data, full time travel under each version's own
  * names, pushdown/pruning intact through the logical view, and the
  * non-resurrection guarantee for re-added dropped names.
  */
class ColumnMappingSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-cmap-$name").resolve("t").toString

  /** Two range-disjoint single-file appends over id: [0,99], [100,199]. */
  private def table(): String = {
    import spark.implicits._
    val p = tmp("t")
    def slice(lo: Int): DataFrame =
      (lo until lo + 100).map(i => (i.toLong, s"name$i", i % 7)).toDF("id", "name", "grp")
        .repartition(1)
    VersionedTable.overwrite(slice(0), p)
    VersionedTable.append(slice(100), p)
    p
  }

  private def numFilesPlanned(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect { case s: FileSourceScanExec => s }
    assert(scans.size == 1)
    scans.head.metrics("numFiles").value
  }

  test("rename: metadata-only commit, logical reads, time travel keeps old names") {
    val p = table()
    val before = VersionedTable.versions(p).last
    val v = VersionedTable.renameColumn(p, "name", "title")
    assert(v.snapshotId == before.snapshotId, "rename must not change content id")
    assert(v.dirs == before.dirs, "rename must not move data")
    assert(VersionedTable.tableSchema(p).fieldNames.toSeq == Seq("id", "title", "grp"))
    assert(VersionedTable.read(p).schema.fieldNames.contains("title"))
    assert(VersionedTable.scan(p).where(col("title") === "name5")
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(5L))
    // the version BEFORE the rename still reads under the old name
    assert(VersionedTable.readAsOf(p, before.seq).schema.fieldNames.contains("name"))
    // history labels the evolution commit
    val op = VersionedTable.history(p).orderBy(col("version").desc)
      .select("operation").head().getString(0)
    assert(op == "schema", s"expected schema, got $op")
    intercept[IllegalArgumentException](VersionedTable.renameColumn(p, "missing", "x"))
    intercept[IllegalArgumentException](VersionedTable.renameColumn(p, "id", "grp"))
  }

  test("pushdown on a renamed column still prunes file groups") {
    val p = table()
    VersionedTable.renameColumn(p, "id", "doc")
    // the logical-name filter must reach the physical stats: 1 of 2 files
    val q = VersionedTable.scan(p).where(col("doc").between(120, 130))
    assert(numFilesPlanned(q) == 1, "manifest pruning lost through the rename")
    assert(q.count() == 11)
  }

  test("append and merge speak logical names after a rename") {
    import spark.implicits._
    val p = table()
    VersionedTable.renameColumn(p, "name", "title")
    VersionedTable.append(
      Seq((200L, "name200", 3)).toDF("id", "title", "grp").repartition(1), p)
    val r = VersionedTable.read(p)
    assert(r.count() == 201)
    assert(r.where(col("id") === 200L).select("title").head().getString(0) == "name200")
    // merge keyed on the LOGICAL renamed id column
    VersionedTable.renameColumn(p, "id", "doc")
    VersionedTable.merge(
      Seq((5L, "patched", 0), (999L, "inserted", 1)).toDF("doc", "title", "grp"),
      p, "doc")
    val m = VersionedTable.read(p)
    assert(m.count() == 202)
    assert(m.where(col("doc") === 5L).select("title").head().getString(0) == "patched")
    assert(m.where(col("doc") === 999L).count() == 1)
  }

  test("drop: O(1) tombstone, files untouched, re-added name never resurrects") {
    import spark.implicits._
    val p = table()
    val filesBefore = VersionedTable.filesMetadata(p).count()
    val before = VersionedTable.versions(p).last
    val v = VersionedTable.dropColumn(p, "name")
    assert(v.snapshotId == before.snapshotId && v.dirs == before.dirs)
    assert(VersionedTable.filesMetadata(p).count() == filesBefore, "drop rewrote data")
    assert(VersionedTable.tableSchema(p).fieldNames.toSeq == Seq("id", "grp"))
    assert(!VersionedTable.scan(p).schema.fieldNames.contains("name"))
    // time travel: the column is still there in pre-drop versions
    assert(VersionedTable.readAsOf(p, before.seq).schema.fieldNames.contains("name"))
    // re-add the logical name: old values must NOT come back
    VersionedTable.append(
      Seq((500L, "fresh", 1)).toDF("id", "name", "grp").repartition(1), p)
    val r = VersionedTable.read(p)
    assert(r.schema.fieldNames.contains("name"))
    assert(r.where(col("id") === 500L).select("name").head().getString(0) == "fresh")
    val resurrected = r.where(col("id") < 200L && col("name").isNotNull).count()
    assert(resurrected == 0, s"$resurrected dropped values resurrected")
    intercept[IllegalArgumentException](VersionedTable.dropColumn(p, "nope"))
  }

  test("deleteRange and sorted rewrite accept logical names; compact preserves the mapping") {
    val p = table()
    VersionedTable.renameColumn(p, "id", "doc")
    VersionedTable.deleteRange(p, "doc", 0, 49)
    assert(VersionedTable.read(p).count() == 150)
    val preSort = VersionedTable.versions(p).last
    VersionedTable.rewriteSorted(p, "doc", targetGroups = 2)
    val afterSort = VersionedTable.versions(p).last
    assert(afterSort.snapshotId == preSort.snapshotId, "rewrite changed content")
    assert(afterSort.colMap == preSort.colMap, "rewrite lost the mapping")
    VersionedTable.compact(p)
    val afterCompact = VersionedTable.versions(p).last
    assert(afterCompact.colMap == preSort.colMap, "compact lost the mapping")
    assert(VersionedTable.scan(p).where(col("doc") === 60L).count() == 1)
  }

  test("rollback restores the mapping as of the target version") {
    val p = table()
    val preRename = VersionedTable.versions(p).last
    VersionedTable.renameColumn(p, "name", "title")
    VersionedTable.rollbackTo(p, preRename.seq)
    assert(VersionedTable.tableSchema(p).fieldNames.contains("name"))
    assert(!VersionedTable.tableSchema(p).fieldNames.contains("title"))
    // roll forward again: mapping comes back with the restored version
    val renamed = VersionedTable.versions(p).find(_.colMap.isDefined).get
    VersionedTable.rollbackTo(p, renamed.seq)
    assert(VersionedTable.tableSchema(p).fieldNames.contains("title"))
  }

  test("format surface refuses mapped tables loudly; overwrite resets the mapping") {
    import spark.implicits._
    val p = table()
    VersionedTable.renameColumn(p, "name", "title")
    val e = intercept[IllegalArgumentException](
      spark.read.format("graft-versioned").load(p).collect())
    assert(e.getMessage.contains("column mapping"))
    // an overwrite replaces content AND schema lineage: mapping resets,
    // and the format surface serves the table again
    VersionedTable.overwrite(Seq((1L, "x")).toDF("k", "v"), p)
    assert(VersionedTable.versions(p).last.colMap.isEmpty)
    assert(spark.read.format("graft-versioned").load(p).count() == 1)
  }
}
