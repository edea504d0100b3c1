package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Semantic-parity seam between [[VersionedTable]] and REAL Delta Lake
  * (VERDICT r4 item 9 — the Delta twin of IcebergSeamSpec): the sandbox
  * has no Delta jar (offline classpath), so the modeled format's
  * divergence risk is bounded by THIS suite the day a jar appears —
  * every test `assume`s the Delta catalog class and self-CANCELS (not
  * passes, not fails) when absent. Nothing links against Delta at
  * compile time: a dedicated SparkSession is created on the shared
  * SparkContext with the Delta extension + catalog configured BY NAME,
  * and all table operations go through paths and SQL.
  *
  * The parity claims mirrored from the modeled surface:
  *   - version-isolated appends; per-version content equality
  *     (`versionAsOf` vs [[VersionedTable.readAsOf]])
  *   - row-level DELETE leaves prior versions readable (time travel)
  *   - metadata-only column RENAME under column mapping keeps the
  *     snapshot readable old-named in history — exactly the
  *     [[VersionedTable.renameColumn]] / q67 semantics
  */
class DeltaSeamSpec extends SparkSpec {
  import spark.implicits._

  private lazy val deltaAvailable: Boolean =
    try {
      Class.forName("org.apache.spark.sql.delta.catalog.DeltaCatalog"); true
    } catch { case _: Throwable => false }

  /** A session with the Delta extension actually INSTALLED (extensions
    * are constructor-time, so runtime conf.set on the shared session
    * cannot enable them): clear the active/default session and let
    * getOrCreate build a sibling on the same SparkContext.
    */
  private def withDeltaSession[A](f: SparkSession => A): A = {
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .config("spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension")
        .config("spark.sql.catalog.spark_catalog",
          "org.apache.spark.sql.delta.catalog.DeltaCatalog")
        .getOrCreate()
      f(s)
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }

  private def rows(lo: Int, hi: Int): DataFrame =
    (lo to hi).map(i => (i.toLong, s"txt$i")).toDF("id", "text")

  private def contents(df: DataFrame): Seq[(Long, String)] =
    df.select(col("id"), col(df.columns.last))
      .as[(Long, String)].collect().sorted.toSeq

  test("delta seam: version-isolated appends match VersionedTable per version") {
    assume(deltaAvailable, "Delta jar not on the classpath — seam self-skips")
    withDeltaSession { s =>
      val path = Files.createTempDirectory("graft-delta-seam").resolve("t").toString
      rows(0, 9).write.format("delta").save(path)
      rows(10, 19).write.format("delta").mode("append").save(path)
      val vt = Files.createTempDirectory("graft-seam-vt").resolve("t").toString
      VersionedTable.append(rows(0, 9), vt)(s)
      VersionedTable.append(rows(10, 19), vt)(s)
      assert(contents(s.read.format("delta").load(path))
        == contents(VersionedTable.read(vt)(s)))
      // per-version parity: delta version 0 == our v1
      assert(contents(s.read.format("delta")
          .option("versionAsOf", 0).load(path))
        == contents(VersionedTable.readAsOf(vt, 1)(s)))
      val nVersions = s.sql(s"DESCRIBE HISTORY delta.`$path`").count()
      assert(nVersions == 2L)
    }
  }

  test("delta seam: time travel after row-level delete keeps old versions") {
    assume(deltaAvailable, "Delta jar not on the classpath — seam self-skips")
    withDeltaSession { s =>
      val path = Files.createTempDirectory("graft-delta-seam").resolve("t").toString
      rows(0, 19).write.format("delta").save(path)
      s.sql(s"DELETE FROM delta.`$path` WHERE id BETWEEN 5 AND 9")
      val vt = Files.createTempDirectory("graft-seam-vt").resolve("t").toString
      VersionedTable.append(rows(0, 19), vt)(s)
      VersionedTable.deleteRange(vt, "id", 5L, 9L)(s)
      assert(contents(s.read.format("delta").load(path))
        == contents(VersionedTable.read(vt)(s)))
      assert(contents(s.read.format("delta").option("versionAsOf", 0).load(path))
        == contents(VersionedTable.readAsOf(vt, 1)(s)),
        "pre-delete versions must stay readable in both formats")
    }
  }

  test("delta seam: column-mapping rename is metadata-only, history keeps old name") {
    assume(deltaAvailable, "Delta jar not on the classpath — seam self-skips")
    withDeltaSession { s =>
      val path = Files.createTempDirectory("graft-delta-seam").resolve("t").toString
      rows(0, 9).write.format("delta").save(path)
      s.sql(s"""ALTER TABLE delta.`$path` SET TBLPROPERTIES (
        |'delta.columnMapping.mode' = 'name',
        |'delta.minReaderVersion' = '2',
        |'delta.minWriterVersion' = '5')""".stripMargin)
      s.sql(s"ALTER TABLE delta.`$path` RENAME COLUMN text TO body")
      val vt = Files.createTempDirectory("graft-seam-vt").resolve("t").toString
      VersionedTable.append(rows(0, 9), vt)(s)
      VersionedTable.renameColumn(vt, "text", "body")(s)
      val delta = s.read.format("delta").load(path)
      val ours = VersionedTable.read(vt)(s)
      assert(delta.columns.toSeq == Seq("id", "body"))
      assert(ours.columns.toSeq == Seq("id", "body"))
      assert(contents(delta) == contents(ours),
        "rename must not rewrite data in either format")
      // time travel BEFORE the rename reads the old column name
      assert(s.read.format("delta").option("versionAsOf", 0).load(path)
        .columns.toSeq == Seq("id", "text"))
      assert(VersionedTable.readAsOf(vt, 1)(s).columns.toSeq
        == Seq("id", "text"))
    }
  }
}
