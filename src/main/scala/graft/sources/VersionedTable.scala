package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg snapshot/time-travel semantics modeled on parquet (the second
  * half of the S1 story beside TableIO's partition-scoped replace): data
  * files are IMMUTABLE — every commit writes a fresh `data/v<seq>-<id>/`
  * directory and appends a manifest line to `_graft_manifest.jsonl`
  * naming the COMPLETE set of directories that make up the table at that
  * version (overwrite = just the new dir; append = previous dirs + new
  * dir). Reads resolve a manifest, never a directory listing, so:
  *
  *  - `read`         = latest committed version (readers are isolated
  *    from in-flight writes — the manifest line is the commit point);
  *  - `readAsOf(v)`  = time travel to any retained version (the
  *    reference's backup-table dance, MergeAndExportInfo.py:85-89, is
  *    `readAsOf(current - 1)`);
  *  - `expire(keep)` = Iceberg's expire_snapshots: drops manifests older
  *    than the newest `keep` and deletes data dirs no retained version
  *    references.
  *
  * Each manifest row carries the deterministic content snapshot id
  * (TableIO.snapshotId), so an idempotent re-commit is detectable and
  * lineage rows can cite exact versions.
  */
object VersionedTable {

  final case class Version(seq: Int, snapshotId: Long, dirs: Seq[String])

  private def manifestPath(table: String) = Paths.get(table, "_graft_manifest.jsonl")

  def versions(table: String): Seq[Version] = {
    val p = manifestPath(table)
    if (!Files.exists(p)) return Seq.empty
    import scala.jdk.CollectionConverters._
    // a malformed line (e.g. torn by a crash mid-append) is an UNCOMMITTED
    // version: skip it — the manifest line is the commit point, so a torn
    // tail must never brick reads of previously committed versions
    Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty).flatMap { line =>
      for {
        seq <- """"seq":(\d+)""".r.findFirstMatchIn(line).map(_.group(1).toInt)
        sid <- """"snapshot_id":(-?\d+)""".r.findFirstMatchIn(line).map(_.group(1).toLong)
        dirsRaw <- """"dirs":\[([^\]]*)\]""".r.findFirstMatchIn(line).map(_.group(1))
        if line.endsWith("}")
      } yield Version(seq, sid,
        dirsRaw.split(',').filter(_.nonEmpty).map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq)
    }
  }

  private def commit(table: String, dirs: Seq[String])(
      implicit spark: SparkSession): Version = {
    val prior = versions(table)
    val seq = prior.lastOption.map(_.seq + 1).getOrElse(1)
    val sid = TableIO.snapshotId(
      spark.read.parquet(dirs.map(d => s"$table/$d"): _*))
    val line = s"""{"seq":$seq,"snapshot_id":$sid,"dirs":[${dirs.map("\"" + _ + "\"").mkString(",")}]}"""
    Files.createDirectories(Paths.get(table))
    Files.writeString(manifestPath(table), line + "\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    Version(seq, sid, dirs)
  }

  private def newDataDir(seq: Int): String =
    s"data/v$seq-${java.util.UUID.randomUUID().toString.take(8)}"

  /** Snapshot-isolation overwrite: new data dir + manifest line naming
    * only it. Old versions stay readable until [[expire]].
    */
  def overwrite(df: DataFrame, table: String)(implicit spark: SparkSession): Version = {
    val seq = versions(table).lastOption.map(_.seq + 1).getOrElse(1)
    val dir = newDataDir(seq)
    df.write.parquet(s"$table/$dir")
    commit(table, Seq(dir))
  }

  /** Append commit: previous version's dirs + one new dir. */
  def append(df: DataFrame, table: String)(implicit spark: SparkSession): Version = {
    val prior = versions(table).lastOption
    val seq = prior.map(_.seq + 1).getOrElse(1)
    val dir = newDataDir(seq)
    df.write.parquet(s"$table/$dir")
    commit(table, prior.map(_.dirs).getOrElse(Seq.empty) :+ dir)
  }

  /** Latest committed version. */
  def read(table: String)(implicit spark: SparkSession): DataFrame = {
    val vs = versions(table)
    require(vs.nonEmpty, s"no committed version in $table")
    readVersion(table, vs.last)
  }

  /** Time travel: the table exactly as of version `seq`. */
  def readAsOf(table: String, seq: Int)(implicit spark: SparkSession): DataFrame = {
    val v = versions(table).find(_.seq == seq)
      .getOrElse(throw new IllegalArgumentException(
        s"version $seq not found (expired or never committed) in $table"))
    readVersion(table, v)
  }

  private def readVersion(table: String, v: Version)(
      implicit spark: SparkSession): DataFrame =
    spark.read.parquet(v.dirs.map(d => s"$table/$d"): _*)

  /** expire_snapshots: keep the newest `keep` versions, delete data dirs
    * referenced by no retained version. Returns the deleted dirs.
    */
  def expire(table: String, keep: Int)(implicit spark: SparkSession): Seq[String] = {
    val vs = versions(table)
    if (vs.size <= keep) return Seq.empty
    val (dropped, retained) = vs.splitAt(vs.size - keep)
    val keepDirs = retained.flatMap(_.dirs).toSet
    val doomed = dropped.flatMap(_.dirs).distinct.filterNot(keepDirs)
    // COMMIT FIRST, delete after — and atomically: the append-only commit
    // path is crash-safe by design (a torn tail line is ignored), so the
    // one rewrite in the lifecycle must not be the hole in that contract.
    // Crash before the move: manifest untouched, nothing deleted. Crash
    // after the move, before/among the deletes: dropped versions are
    // already gone from the manifest (readAsOf gives the clean "expired"
    // error) and any undeleted dirs are unreferenced storage-only orphans
    // (reads never touch them; reclaiming them is a vacuum concern).
    val lines = retained.map(v =>
      s"""{"seq":${v.seq},"snapshot_id":${v.snapshotId},"dirs":[${v.dirs.map("\"" + _ + "\"").mkString(",")}]}""")
    val target = manifestPath(table)
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.writeString(tmp, lines.mkString("", "\n", "\n"))
    Files.move(tmp, target,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    doomed.foreach { d =>
      val root = Paths.get(table, d)
      if (Files.exists(root)) {
        import scala.jdk.CollectionConverters._
        val walk = Files.walk(root)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(Files.delete)
        finally walk.close()
      }
    }
    doomed
  }
}
