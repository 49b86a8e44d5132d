package graft.util

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}

/** Atomic single-file pointer commit, shared by every store that flips
  * a one-line manifest/high-water-mark last (dim snapshots in
  * `sources/Sinks`, the crawl-history membership store in
  * `streaming/CrawlStore`, the host-graph edge store in
  * `streaming/HostRank`). Centralized because the delete-then-rename
  * shortcut is a data-loss crash window: a failure between the delete
  * and the rename leaves NO pointer, so a restarting reader falls back
  * to "no store" and the compacted tier whose source increments were
  * already deleted becomes invisible — permanently, once the next
  * compaction rebuilds from increments alone. */
object AtomicCommit {

  /** Commit `text` as the pointer file at `target`, atomically for
    * readers of that filesystem. Two strategies, selected by URI
    * SCHEME (not by FileContext availability — an S3A deployment that
    * configures fs.AbstractFileSystem.s3a.impl would satisfy that
    * probe while its rename is copy+delete, the opposite of atomic):
    *
    *  - hdfs/file/viewfs/abfs(s): write a uniquely-named tmp file,
    *    then a single-file FileContext.rename with OVERWRITE — atomic
    *    on these filesystems (ADLS Gen2's hierarchical namespace gives
    *    abfs real atomic rename, and its create-append-flush write
    *    path makes the direct-overwrite branch UNSAFE there: a reader
    *    could see the truncated-but-unflushed file);
    *  - every other scheme (s3a, gs, ...): write `target` directly — a
    *    single-object PUT is all-or-nothing on flat object stores (the
    *    object becomes visible only on close), so a reader sees the
    *    whole old or whole new pointer, never a torn write. Rename
    *    there would be copy+delete with a visible gap. */
  def commitPointer(fs: FileSystem, target: Path, text: String): Unit = {
    val scheme =
      Option(target.toUri.getScheme).getOrElse(fs.getUri.getScheme)
    val atomicRename =
      Set("hdfs", "file", "viewfs", "abfs", "abfss").contains(scheme)
    if (atomicRename) {
      val tmp = new Path(target.getParent,
        s"${target.getName}.tmp.${java.util.UUID.randomUUID()}")
      val out = fs.create(tmp, true)
      try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      FileContext.getFileContext(target.toUri, fs.getConf)
        .rename(tmp, target, Options.Rename.OVERWRITE)
    } else {
      val out = fs.create(target, true)
      try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
  }

  /** Read a pointer committed by [[commitPointer]], split on
    * whitespace; None when absent (no store yet). */
  def readPointer(fs: FileSystem, target: Path): Option[Array[String]] = {
    if (!fs.exists(target)) None
    else {
      val in = fs.open(target)
      val line =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      Some(line.split("\\s+"))
    }
  }
}
