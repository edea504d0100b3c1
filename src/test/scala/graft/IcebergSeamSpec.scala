package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Semantic-parity seam between [[VersionedTable]] and REAL Apache
  * Iceberg (VERDICT r3 item 9): the sandbox has no Iceberg jar (offline
  * classpath), so the modeled table format's divergence risk is bounded
  * by THIS suite the day a jar appears — every test `assume`s the
  * Iceberg Spark catalog class and self-CANCELS (not passes, not fails)
  * when it is absent. Nothing here links against Iceberg at compile
  * time: the catalog is configured by name through Spark's lazy catalog
  * resolution, and all table operations go through plain SQL.
  *
  * The parity claims mirrored from the modeled surface:
  *   - snapshot-isolated appends, content equality per version
  *   - time travel (`VERSION AS OF`) returns the exact historical rows
  *   - row-level DELETE leaves prior snapshots readable
  *   - snapshot expiry bounds history like [[VersionedTable.expire]]
  */
class IcebergSeamSpec extends SparkSpec {
  import spark.implicits._

  private lazy val icebergAvailable: Boolean =
    try { Class.forName("org.apache.iceberg.spark.SparkCatalog"); true }
    catch { case _: Throwable => false }

  private def withSeamCatalog[A](f: String => A): A = {
    val wh = Files.createTempDirectory("graft-iceberg-seam").toString
    spark.conf.set("spark.sql.catalog.seam", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.seam.type", "hadoop")
    spark.conf.set("spark.sql.catalog.seam.warehouse", wh)
    f("seam.db.t" + java.util.UUID.randomUUID().toString.take(8).replace("-", ""))
  }

  private def rows(lo: Int, hi: Int): DataFrame =
    (lo to hi).map(i => (i.toLong, s"txt$i")).toDF("id", "text")

  private def contents(df: DataFrame): Seq[(Long, String)] =
    df.select("id", "text").as[(Long, String)].collect().sorted.toSeq

  test("iceberg seam: snapshot-isolated appends match VersionedTable per version") {
    assume(icebergAvailable, "Iceberg jar not on the classpath — seam self-skips")
    withSeamCatalog { tbl =>
      spark.sql(s"CREATE TABLE $tbl (id BIGINT, text STRING) USING iceberg")
      rows(0, 9).writeTo(tbl).append()
      rows(10, 19).writeTo(tbl).append()
      val vt = Files.createTempDirectory("graft-seam-vt").resolve("t").toString
      VersionedTable.append(rows(0, 9), vt)
      VersionedTable.append(rows(10, 19), vt)
      assert(contents(spark.table(tbl)) == contents(VersionedTable.read(vt)))
      // per-snapshot parity: iceberg's first snapshot == our v1
      val snaps = spark.sql(s"SELECT snapshot_id FROM $tbl.snapshots ORDER BY committed_at")
        .as[Long].collect()
      assert(snaps.length == 2)
      assert(contents(spark.read.option("snapshot-id", snaps.head.toString).table(tbl))
        == contents(VersionedTable.readAsOf(vt, 1)))
    }
  }

  test("iceberg seam: time travel after row-level delete keeps old snapshots") {
    assume(icebergAvailable, "Iceberg jar not on the classpath — seam self-skips")
    withSeamCatalog { tbl =>
      spark.sql(s"CREATE TABLE $tbl (id BIGINT, text STRING) USING iceberg")
      rows(0, 19).writeTo(tbl).append()
      spark.sql(s"DELETE FROM $tbl WHERE id BETWEEN 5 AND 9")
      val vt = Files.createTempDirectory("graft-seam-vt").resolve("t").toString
      VersionedTable.append(rows(0, 19), vt)
      VersionedTable.deleteRange(vt, "id", 5L, 9L)
      assert(contents(spark.table(tbl)) == contents(VersionedTable.read(vt)))
      val firstSnap = spark.sql(
        s"SELECT snapshot_id FROM $tbl.snapshots ORDER BY committed_at LIMIT 1")
        .as[Long].head()
      assert(contents(spark.sql(s"SELECT * FROM $tbl VERSION AS OF $firstSnap"))
        == contents(VersionedTable.readAsOf(vt, 1)),
        "pre-delete snapshots must stay readable in both formats")
    }
  }

  test("iceberg seam: snapshot expiry bounds history like expire()") {
    assume(icebergAvailable, "Iceberg jar not on the classpath — seam self-skips")
    withSeamCatalog { tbl =>
      spark.sql(s"CREATE TABLE $tbl (id BIGINT, text STRING) USING iceberg")
      rows(0, 4).writeTo(tbl).append()
      rows(5, 9).writeTo(tbl).append()
      rows(10, 14).writeTo(tbl).append()
      spark.sql(s"CALL seam.system.expire_snapshots(table => '${tbl.stripPrefix("seam.")}', " +
        "older_than => TIMESTAMP '9999-01-01 00:00:00', retain_last => 1)")
      val left = spark.sql(s"SELECT count(*) FROM $tbl.snapshots").as[Long].head()
      assert(left == 1L, "expiry must retain exactly the tip")
      assert(contents(spark.table(tbl)) == contents(rows(0, 14)),
        "tip content unaffected by expiry — the VersionedTable.expire contract")
    }
  }
}
