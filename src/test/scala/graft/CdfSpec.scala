package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Change data feed (Delta CDF analogue): row-level commits capture their
  * changed rows at commit time; readChangeFeed replays (from, to] as typed
  * change rows — inserts from append file groups, delete/update rows from
  * the capture sidecars, nothing from layout-only rewrites — and refuses
  * loudly what was never captured. The final test is the consumer
  * contract: folding the feed into a materialized copy of v_from
  * reproduces the v_to snapshot exactly.
  */
class CdfSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-cdf").resolve("t").toString

  private def rows(lo: Int, hi: Int): DataFrame =
    (lo to hi).map(i => (i.toLong, s"txt$i", i % 5)).toDF("id", "text", "grp")
      .repartition(2)

  private def feed(p: String, from: Int, to: Int): DataFrame =
    VersionedTable.readChangeFeed(p, from, to)

  test("append-only feed: new file groups stream as inserts per commit") {
    val p = tmp()
    VersionedTable.setChangeCapture(p, enabled = true)
    VersionedTable.overwrite(rows(0, 9), p)
    VersionedTable.append(rows(10, 19), p)
    VersionedTable.append(rows(20, 29), p)
    val f = feed(p, 1, 3).select("id", "_change_type", "_commit_version").collect()
    assert(f.length == 20)
    assert(f.forall(_.getString(1) == "insert"))
    assert(f.filter(_.getInt(2) == 2).map(_.getLong(0)).sorted.toSeq == (10L to 19L))
    assert(f.filter(_.getInt(2) == 3).map(_.getLong(0)).sorted.toSeq == (20L to 29L))
    // empty window: no rows, feed columns present
    val e = feed(p, 3, 3)
    assert(e.count() == 0)
    assert(e.columns.contains("_change_type") && e.columns.contains("_commit_version"))
  }

  test("deleteRange captures exactly the deleted rows") {
    val p = tmp()
    VersionedTable.setChangeCapture(p, enabled = true)
    VersionedTable.overwrite(rows(0, 99), p)
    VersionedTable.deleteRange(p, "id", 20L, 29L)
    val f = feed(p, 1, 2).collect()
    assert(f.length == 10)
    assert(f.forall(_.getAs[String]("_change_type") == "delete"))
    assert(f.map(_.getAs[Long]("id")).sorted.toSeq == (20L to 29L))
    // deleted rows carry their full payload, not just the key
    assert(f.forall(r => r.getAs[String]("text") == s"txt${r.getAs[Long]("id")}"))
  }

  test("merge captures preimage, postimage and insert slices") {
    val p = tmp()
    VersionedTable.setChangeCapture(p, enabled = true)
    VersionedTable.overwrite(rows(0, 49), p)
    // batch: updates ids 40..49 (text rewritten), inserts 50..54
    val batch = (40 to 54).map(i => (i.toLong, s"new$i", i % 5))
      .toDF("id", "text", "grp")
    VersionedTable.merge(batch, p, "id")
    val f = feed(p, 1, 2).collect()
    val byType = f.groupBy(_.getAs[String]("_change_type"))
    assert(byType("update_preimage").map(_.getAs[Long]("id")).sorted.toSeq == (40L to 49L))
    assert(byType("update_preimage").forall(r => r.getAs[String]("text").startsWith("txt")))
    assert(byType("update_postimage").map(_.getAs[Long]("id")).sorted.toSeq == (40L to 49L))
    assert(byType("update_postimage").forall(r => r.getAs[String]("text").startsWith("new")))
    assert(byType("insert").map(_.getAs[Long]("id")).sorted.toSeq == (50L to 54L))
  }

  test("merge into disjoint key space is pure insert") {
    val p = tmp()
    VersionedTable.setChangeCapture(p, enabled = true)
    VersionedTable.overwrite(rows(0, 9), p)
    VersionedTable.merge(rows(100, 104), p, "id")
    val f = feed(p, 1, 2).collect()
    assert(f.length == 5 && f.forall(_.getAs[String]("_change_type") == "insert"))
  }

  test("uncaptured row-level commits and overwrites fail loudly") {
    val p = tmp()
    VersionedTable.overwrite(rows(0, 49), p) // capture NOT enabled
    VersionedTable.deleteRange(p, "id", 0L, 4L)
    val e1 = intercept[IllegalStateException](feed(p, 1, 2).collect())
    assert(e1.getMessage.contains("without a recorded change capture"))
    // enabling later doesn't backfill v2
    VersionedTable.setChangeCapture(p, enabled = true)
    intercept[IllegalStateException](feed(p, 1, 2).collect())
    // an overwrite is never representable as a feed
    VersionedTable.overwrite(rows(0, 9), p)
    intercept[IllegalStateException](feed(p, 2, 3).collect())
  }

  test("layout-only rewrites contribute nothing to the feed") {
    val p = tmp()
    VersionedTable.setChangeCapture(p, enabled = true)
    VersionedTable.overwrite(rows(0, 49), p)
    VersionedTable.append(rows(50, 59), p)
    VersionedTable.compact(p)             // v3: content id unchanged
    VersionedTable.rewriteSorted(p, "id", targetGroups = 2) // v4
    val f = feed(p, 2, 4)
    assert(f.count() == 0, "compaction/sort must not re-deliver rows")
    // the full window still carries v2's insert slice
    assert(feed(p, 1, 4).count() == 10)
  }

  test("expire drops the sidecar; vacuum reclaims an uncommitted one") {
    val p = tmp()
    VersionedTable.setChangeCapture(p, enabled = true)
    VersionedTable.overwrite(rows(0, 49), p)
    VersionedTable.deleteRange(p, "id", 0L, 9L)  // v2 + changes/v2
    VersionedTable.append(rows(100, 104), p)     // v3
    assert(feed(p, 1, 3).count() == 15)
    val dropped = VersionedTable.expire(p, keep = 1)
    assert(dropped.exists(_.startsWith("changes/v2")),
      s"expire must drop v2's sidecar: $dropped")
    // an orphan sidecar from a crashed writer
    val orphan = java.nio.file.Paths.get(p, "changes/v99")
    Files.createDirectories(orphan)
    Files.writeString(orphan.resolve("part-0.parquet"), "junk")
    val removed = VersionedTable.vacuum(p, olderThanMillis = -1000L)
    assert(removed.contains("changes/v99"))
    assert(!Files.exists(orphan))
  }

  test("an orphan sidecar is never replayed as another commit's changes") {
    val p = tmp()
    VersionedTable.setChangeCapture(p, enabled = true)
    VersionedTable.overwrite(rows(0, 19), p) // v1
    // a crashed op's orphan at the LEGACY name of the NEXT seq: a commit
    // that then claims seq 2 must NOT adopt it as its change set
    val orphan2 = java.nio.file.Paths.get(p, "changes/v2")
    Files.createDirectories(orphan2)
    Files.writeString(orphan2.resolve("part-0.parquet"), "junk")
    VersionedTable.overwrite(rows(50, 59), p) // v2: uncaptured overwrite
    val e = intercept[IllegalStateException](feed(p, 1, 2).collect())
    assert(e.getMessage.contains("without a recorded change capture"),
      s"feed must refuse, not replay the orphan: ${e.getMessage}")
    // and a retried row-level op never collides with its own leftover:
    // an orphan already sits at the legacy name of seq 3
    val orphan3 = java.nio.file.Paths.get(p, "changes/v3")
    Files.createDirectories(orphan3)
    Files.writeString(orphan3.resolve("part-0.parquet"), "junk")
    val v3 = VersionedTable.deleteRange(p, "id", 50L, 52L) // commits fine
    assert(v3.seq == 3 && v3.changes.exists(_.startsWith("changes/v3-")))
    assert(feed(p, 2, 3).count() == 3)
    // vacuum reclaims both orphans but keeps the recorded sidecar
    val removed = VersionedTable.vacuum(p, olderThanMillis = -1000L)
    assert(removed.contains("changes/v2") && removed.contains("changes/v3"))
    assert(feed(p, 2, 3).count() == 3, "recorded sidecar must survive vacuum")
  }

  test("feed surfaces the toSeq logical schema after a rename") {
    val p = tmp()
    VersionedTable.setChangeCapture(p, enabled = true)
    VersionedTable.overwrite(rows(0, 9), p)
    VersionedTable.deleteRange(p, "id", 0L, 1L)   // v2, captured physically
    VersionedTable.renameColumn(p, "text", "body") // v3, metadata-only
    val f = feed(p, 1, 3)
    assert(f.columns.contains("body") && !f.columns.contains("text"))
    assert(f.where(col("_change_type") === "delete").count() == 2)
  }

  test("consumer contract: folding the feed onto v_from reproduces v_to") {
    val p = tmp()
    VersionedTable.setChangeCapture(p, enabled = true)
    VersionedTable.overwrite(rows(0, 99), p)                       // v1
    VersionedTable.append(rows(100, 119), p)                       // v2
    VersionedTable.deleteRange(p, "id", 30L, 44L)                  // v3
    val batch = (110 to 124).map(i => (i.toLong, s"upd$i", i % 5))
      .toDF("id", "text", "grp")
    VersionedTable.merge(batch, p, "id")                           // v4
    val from = VersionedTable.readAsOf(p, 1)
    val changes = feed(p, 1, 4)
    // fold per commit in order: delete preimages/deletes by key, then add
    // inserts/postimages — the standard CDC apply
    val commits = changes.select("_commit_version").distinct()
      .collect().map(_.getInt(0)).sorted
    var derived = from
    commits.foreach { cv =>
      val c = changes.where(col("_commit_version") === cv)
      val gone = c.where(col("_change_type").isin("delete", "update_preimage"))
        .select("id")
      val added = c.where(col("_change_type").isin("insert", "update_postimage"))
        .select("id", "text", "grp")
      derived = derived.join(gone, Seq("id"), "left_anti").unionByName(added)
    }
    val want = VersionedTable.read(p).orderBy("id").collect().toSeq
    val got = derived.select("id", "text", "grp").orderBy("id").collect().toSeq
    assert(got == want, "feed fold must reproduce the v4 snapshot")
  }
}
