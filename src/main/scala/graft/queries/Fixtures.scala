package graft.queries

import java.nio.file.{Files, Path, Paths}

/** Shared machinery for per-SF fixture caches under java.io.tmpdir.
  *
  * One stamped-directory convention for every fixture builder
  * (SourceQueries archives, PipelineQueries snapshot, CrossrefQueries
  * messages) so the hardening lives in ONE place:
  *  - the stamp covers the source parquet's (size, mtime) — a
  *    regenerated testdata dir can never serve stale fixtures — AND a
  *    builder logicVersion, so editing the synthesis code invalidates
  *    the cache too (without it, a changed builder would silently keep
  *    reading the old materialization and hash-diverge from its
  *    updated oracle);
  *  - publication is by atomic directory move with the loser deleting
  *    its temp (two racing sessions both build, exactly one wins,
  *    neither ever reads a half-written dir).
  */
object Fixtures {

  /** Stamped cache root for (sfDir, srcTable, kind, logicVersion). */
  def stampedDir(sfDir: String, srcTable: String, kind: String,
                 logicVersion: Int): Path = {
    val src = new java.io.File(s"$sfDir/$srcTable.parquet")
    val tag = sfDir.replaceAll("[^a-zA-Z0-9.]", "_")
    val p = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_${kind}_v${logicVersion}_${tag}_${src.length()}_${src.lastModified()}")
    Files.createDirectories(p)
    p
  }

  /** Publish `tmp` as `target` atomically; on a lost race, keep the
    * winner's copy (content is deterministic per stamp) and drop ours.
    * A lost race can surface as more than FileAlreadyExistsException:
    * rename(2) onto a directory that appeared between the JDK's
    * pre-check and the syscall returns ENOTEMPTY (FileSystemException),
    * so any IO failure with the target now present counts as losing. */
  def publish(tmp: Path, target: Path): Unit =
    try Files.move(tmp, target)
    catch {
      case e: java.io.IOException =>
        if (Files.exists(target)) deleteRecursively(tmp) else throw e
    }

  def deleteRecursively(p: Path): Unit = if (Files.exists(p)) {
    import scala.jdk.CollectionConverters._
    Files.walk(p).iterator().asScala.toSeq
      .sortBy(-_.getNameCount).foreach(Files.delete)
  }
}
