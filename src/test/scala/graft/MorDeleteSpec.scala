package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.sources.{TableIO, VersionedTable}

/** Merge-on-read equality deletes (Iceberg v2 delete files): a morDelete
  * commits one small key file and NO data rewrites; reads subtract the
  * keys via broadcast anti-joins above the scan; the content snapshot id
  * stays exact (hash-sum adjustment — pinned here against a full
  * recompute); scope follows the sequence-number rule (later appends of a
  * deleted key survive); applyDeletes folds the debt back into the data
  * gated on content identity.
  */
class MorDeleteSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-mor").resolve("t").toString

  private def rows(lo: Int, hi: Int): DataFrame =
    (lo to hi).map(i => (i.toLong, s"txt$i", i % 5)).toDF("id", "text", "grp")
      .repartition(2)

  private def keys(ids: Long*): DataFrame = ids.toDF("id")

  test("morDelete removes matching rows with zero data-file rewrites") {
    val p = tmp()
    VersionedTable.overwrite(rows(0, 49), p)              // v1
    VersionedTable.append(rows(50, 99), p)                // v2
    val filesBefore = VersionedTable.filesMetadata(p).collect().map(_.getString(1)).sorted
    val v3 = VersionedTable.morDelete(keys(3L, 17L, 60L), p)
    assert(v3.seq == 3 && v3.dels.size == 1 && v3.dels.head.matched == 3)
    // data files byte-identical: same names, no rewrite happened
    val filesAfter = VersionedTable.filesMetadata(p).collect().map(_.getString(1)).sorted
    assert(filesAfter.toSeq == filesBefore.toSeq)
    val got = VersionedTable.read(p).select("id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (0L to 99L).filterNot(Set(3L, 17L, 60L)))
    // time travel to the pre-delete version still sees everything
    assert(VersionedTable.readAsOf(p, 2).count() == 100)
    // history: the delete is a dirs-stable rowlevel commit, logical counts
    val h = VersionedTable.history(p).orderBy("version").collect()
    assert(h.map(_.getAs[String]("operation")).toSeq == Seq("base", "append", "rowlevel"))
    assert(h.last.getAs[Long]("n_rows") == 97L)
  }

  test("the adjusted snapshot id equals a full content recompute") {
    val p = tmp()
    VersionedTable.overwrite(rows(0, 199), p)
    val v2 = VersionedTable.morDelete(keys(5L, 6L, 7L, 150L), p)
    val recomputed = TableIO.snapshotId(VersionedTable.read(p))
    assert(v2.snapshotId == recomputed,
      "morDelete's hash-sum adjustment must reproduce the exact content id")
    // and a second delete composes additively
    val v3 = VersionedTable.morDelete(keys(0L, 199L), p)
    assert(v3.dels.size == 2)
    assert(v3.snapshotId == TableIO.snapshotId(VersionedTable.read(p)))
  }

  test("sequence-number scope: rows appended after the delete survive it") {
    val p = tmp()
    VersionedTable.overwrite(rows(0, 9), p)               // v1
    VersionedTable.morDelete(keys(4L, 5L), p)             // v2
    // re-insert id 4 with a new payload AFTER the delete
    VersionedTable.append(Seq((4L, "reborn", 99)).toDF("id", "text", "grp"), p) // v3
    val got = VersionedTable.read(p).where(col("id") === 4L).collect()
    assert(got.length == 1 && got(0).getString(1) == "reborn",
      "a post-delete append of a deleted key must survive (Iceberg v2 scope)")
    assert(VersionedTable.read(p).where(col("id") === 5L).count() == 0)
    // scan() resolves identically to read()
    val viaScan = VersionedTable.scan(p).select("id", "text").orderBy("id").collect().toSeq
    val viaRead = VersionedTable.read(p).select("id", "text").orderBy("id").collect().toSeq
    assert(viaScan == viaRead)
  }

  test("matchless keys commit nothing and leave no debris") {
    val p = tmp()
    val v1 = VersionedTable.overwrite(rows(0, 9), p)
    val out = VersionedTable.morDelete(keys(1000L, 2000L), p)
    assert(out.seq == v1.seq && out.dels.isEmpty)
    // null keys never match either
    assert(VersionedTable.morDelete(
      Seq[Option[Long]](None).toDF("id"), p).seq == v1.seq)
    val delRoot = java.nio.file.Paths.get(p, "deletes")
    assert(!Files.exists(delRoot) ||
      !Files.list(delRoot).iterator().hasNext, "abandoned key files must be cleaned")
  }

  test("multi-column keys delete exact tuples only") {
    val p = tmp()
    VersionedTable.overwrite(rows(0, 19), p)
    // (id=3, grp=3) matches; (id=4, grp=3) does not (row 4 has grp 4)
    VersionedTable.morDelete(Seq((3L, 3), (4L, 3)).toDF("id", "grp"), p)
    val got = VersionedTable.read(p).select("id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (0L to 19L).filterNot(_ == 3L))
  }

  test("scan with pending deletes still prunes file groups via pushed filters") {
    val p = tmp()
    def slice(lo: Int): DataFrame =
      (lo until lo + 100).map(i => (i.toLong, s"t$i")).toDF("id", "text").coalesce(1)
    VersionedTable.overwrite(slice(0), p)
    VersionedTable.append(slice(100), p)
    VersionedTable.append(slice(200), p)
    VersionedTable.morDelete(keys(150L), p)
    val q = VersionedTable.scan(p).where(col("id").between(120, 180))
    val got = q.collect()
    assert(got.map(_.getLong(0)).sorted.toSeq == (120L to 180L).filterNot(_ == 150L))
    // data-file scans (the ones carrying `text`) must have pruned to the
    // one matching group per stratum — the anti-join sits ABOVE pruning.
    // The broadcast join makes the plan adaptive, so unwrap AQE nodes.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case s: FileSourceScanExec => Seq(s)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case qs: QueryStageExec => scans(qs.plan)
    }.flatten
    val dataScans = scans(q.queryExecution.executedPlan)
      .filter(_.schema.fieldNames.contains("text"))
    assert(dataScans.nonEmpty, "expected a data-file scan in the executed plan")
    assert(dataScans.map(_.metrics("numFiles").value).sum == 1L,
      "pending deletes must not disable manifest-level file skipping")
    // the single-index observer refuses MOR tables loudly
    val e = intercept[IllegalArgumentException](VersionedTable.scanIndexed(p))
    assert(e.getMessage.contains("pending equality-delete"))
  }

  test("delete scoping follows the RECORDED birth seq, not the dir name") {
    // the append race: a dir's NAME seq is minted from a pre-lock read,
    // so when >=2 commits land between that read and the append's commit
    // the name lags the true commit seq. Simulate the lagged outcome by
    // renaming a post-delete append's dir to a v1-name while the
    // manifest's dirseqs still records its true birth — rows appended
    // AFTER the delete must survive the read (name-based scoping would
    // anti-join them away), and applyDeletes' identity gate must hold.
    val p = tmp()
    VersionedTable.overwrite(rows(0, 49), p)                    // v1
    VersionedTable.morDelete(keys(10L), p)                      // v2 deletes id 10
    VersionedTable.append(Seq((10L, "readd", 0)).toDF("id", "text", "grp"), p) // v3
    assert(VersionedTable.read(p).filter(col("id") === 10).count() == 1)
    // force the lag: v3's dir renamed to a v1 name on disk + in the line
    val mf = new java.io.File(p, "_graft_manifest.jsonl")
    val lines = scala.io.Source.fromFile(mf).getLines().toSeq
    val v3dir = VersionedTable.versions(p).last.dirs
      .find(_.startsWith("data/v3-")).get
    val lagged = "data/v1-lagged00"
    assert(new java.io.File(p, v3dir).renameTo(new java.io.File(p, lagged)))
    java.nio.file.Files.writeString(mf.toPath,
      lines.map(_.replace(v3dir, lagged)).mkString("", "\n", "\n"))
    val reread = VersionedTable.read(p)
    assert(reread.filter(col("id") === 10).count() == 1,
      "post-delete append must survive under a lagging dir NAME")
    assert(reread.count() == 50, "delete still applies to the v1 dir")
    // maintenance still passes its content-identity gate
    VersionedTable.applyDeletes(p)
    assert(VersionedTable.read(p).filter(col("id") === 10).count() == 1)
  }

  test("applyDeletes folds the debt: content id kept, untouched groups by reference") {
    val p = tmp()
    def slice(lo: Int): DataFrame =
      (lo until lo + 50).map(i => (i.toLong, s"t$i")).toDF("id", "text").coalesce(1)
    VersionedTable.overwrite(slice(0), p)      // v1: ids 0..49
    VersionedTable.append(slice(100), p)       // v2: ids 100..149
    val v3 = VersionedTable.morDelete(keys(10L, 11L), p)
    val dirsBefore = VersionedTable.filesMetadata(p).collect().map(_.getString(0)).distinct
    val v4 = VersionedTable.applyDeletes(p)
    assert(v4.dels.isEmpty && VersionedTable.pendingDeletes(p).isEmpty)
    assert(v4.snapshotId == v3.snapshotId, "applying deletes is layout-only")
    val dirsAfter = VersionedTable.filesMetadata(p).collect().map(_.getString(0)).distinct
    // the 100..149 group's stats prove it key-free: carried by reference
    assert(dirsBefore.intersect(dirsAfter).length == 1,
      s"expected exactly one carried group: before=$dirsBefore after=$dirsAfter")
    assert(VersionedTable.read(p).count() == 98)
    // history calls it a rewrite; CoW row-level ops work again
    val h = VersionedTable.history(p).orderBy("version").collect()
    assert(h.last.getAs[String]("operation") == "rewrite")
    VersionedTable.deleteRange(p, "id", 100L, 101L)
    assert(VersionedTable.read(p).count() == 96)
    // idempotent: nothing pending, tip unchanged
    assert(VersionedTable.applyDeletes(p).seq == VersionedTable.versions(p).last.seq)
  }

  test("compact folds pending deletes too; CoW ops refuse while pending") {
    val p = tmp()
    VersionedTable.overwrite(rows(0, 49), p)
    VersionedTable.morDelete(keys(20L, 21L), p)
    val e1 = intercept[IllegalArgumentException](
      VersionedTable.deleteRange(p, "id", 0L, 5L))
    assert(e1.getMessage.contains("pending equality-delete"))
    val e2 = intercept[IllegalArgumentException](
      VersionedTable.merge(rows(0, 1), p, "id"))
    assert(e2.getMessage.contains("pending equality-delete"))
    val tip = VersionedTable.versions(p).last
    val v3 = VersionedTable.compact(p) // single group + pending dels: still rewrites
    assert(v3.seq == tip.seq + 1 && v3.dels.isEmpty)
    assert(v3.snapshotId == tip.snapshotId)
    assert(VersionedTable.read(p).count() == 48)
  }

  test("change feed replays a captured morDelete; uncaptured one refuses") {
    val p = tmp()
    VersionedTable.setChangeCapture(p, enabled = true)
    VersionedTable.overwrite(rows(0, 29), p)
    VersionedTable.morDelete(keys(7L, 8L), p)
    val f = VersionedTable.readChangeFeed(p, 1, 2).collect()
    assert(f.length == 2 && f.forall(_.getAs[String]("_change_type") == "delete"))
    assert(f.map(_.getAs[Long]("id")).sorted.toSeq == Seq(7L, 8L))
    assert(f.forall(r => r.getAs[String]("text") == s"txt${r.getAs[Long]("id")}"))
    // the incremental append walk refuses the window (not append-shaped)
    val e = intercept[IllegalStateException](
      VersionedTable.readChangesBetween(p, 1, 2).collect())
    assert(e.getMessage.contains("morDelete"))
    // uncaptured: a fresh table without capture refuses the feed
    val q = tmp()
    VersionedTable.overwrite(rows(0, 9), q)
    VersionedTable.morDelete(keys(1L), q)
    val e2 = intercept[IllegalStateException](
      VersionedTable.readChangeFeed(q, 1, 2).collect())
    assert(e2.getMessage.contains("without a recorded change capture"))
  }

  test("rollback restores the target's delete-file set either direction") {
    val p = tmp()
    VersionedTable.overwrite(rows(0, 9), p)        // v1
    VersionedTable.morDelete(keys(2L), p)          // v2
    VersionedTable.rollbackTo(p, 1)                // v3: pre-delete content
    assert(VersionedTable.read(p).count() == 10)
    assert(VersionedTable.pendingDeletes(p).isEmpty)
    VersionedTable.rollbackTo(p, 2)                // v4: re-arms the delete
    assert(VersionedTable.read(p).count() == 9)
    assert(VersionedTable.pendingDeletes(p).size == 1)
    assert(VersionedTable.versions(p).last.snapshotId ==
      TableIO.snapshotId(VersionedTable.read(p)))
  }

  test("expire keeps delete files retained versions need; vacuum reclaims orphans") {
    val p = tmp()
    VersionedTable.overwrite(rows(0, 9), p)        // v1
    VersionedTable.morDelete(keys(3L), p)          // v2 (tip, MOR)
    VersionedTable.expire(p, keep = 1)             // drops v1; v2 needs its del file
    assert(VersionedTable.read(p).count() == 9)
    VersionedTable.applyDeletes(p)                 // v3: debt folded
    VersionedTable.expire(p, keep = 1)             // drops v2 → its delete file too
    val delRoot = java.nio.file.Paths.get(p, "deletes")
    assert(!Files.exists(delRoot) || !Files.list(delRoot).iterator().hasNext,
      "expire must reclaim delete files no retained version references")
    assert(VersionedTable.read(p).count() == 9)
    // vacuum reclaims a crashed writer's orphan key file
    val orphan = java.nio.file.Paths.get(p, "deletes/v99-dead")
    Files.createDirectories(orphan)
    Files.writeString(orphan.resolve("part-0.parquet"), "junk")
    assert(VersionedTable.vacuum(p, olderThanMillis = -1000L).contains("deletes/v99-dead"))
    assert(!Files.exists(orphan))
  }
}
