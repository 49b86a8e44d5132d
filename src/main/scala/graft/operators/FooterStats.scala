package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** Driver-side per-file COMMIT statistics from parquet footers — what
  * [[DeltaLite]] and [[IcebergLite]] record per data file (row count,
  * min/max bounds of the prunable columns) comes from the file's own
  * footer instead of a distributed read-back of every byte just
  * written (guide §6: the writer already computed exact stats while
  * writing; §5: one fewer Spark job per commit). Tail-read only: the
  * last 8 bytes give the footer length, one more bounded read gets the
  * footer itself — a commit of N files costs N metadata reads, never a
  * data scan. Files decode in a bounded pool, like manifest decode —
  * a 100 TB table's thousand-file commit must not stat serially. */
private[graft] object FooterStats {

  /** (row count, leaf path → (parquet physical type, min bytes, max
    * bytes)) — bounds present only when every row group carries sound
    * stats for the column (see ParquetFooter.commitStats). */
  final case class FileStats(
      numRows: Long,
      bounds: Map[String, (Int, Array[Byte], Array[Byte])])

  def read(fs: FileSystem, p: Path): FileStats = {
    val len = fs.getFileStatus(p).getLen
    require(len >= 12, s"not a parquet file (too short): $p")
    val in = fs.open(p)
    val footer =
      try {
        val tail8 = new Array[Byte](8)
        in.readFully(len - 8, tail8)
        val flen = (tail8(0) & 0xff) | ((tail8(1) & 0xff) << 8) |
          ((tail8(2) & 0xff) << 16) | ((tail8(3) & 0xff) << 24)
        require(tail8(4) == 'P' && tail8(5) == 'A' &&
          tail8(6) == 'R' && tail8(7) == '1', s"no parquet magic: $p")
        require(flen > 0 && flen <= len - 12,
          s"bad parquet footer length $flen in $p")
        // reconstruct a parse()-shaped buffer: leading magic + footer
        // + trailing length/magic — only the footer bytes are read
        val buf = new Array[Byte](flen + 12)
        buf(0) = 'P'; buf(1) = 'A'; buf(2) = 'R'; buf(3) = '1'
        in.readFully(len - 8 - flen, buf, 4, flen + 8)
        buf
      } finally in.close()
    val st = graft.functions.ParquetFooter.commitStats(footer)
    require(st != null, s"malformed parquet footer: $p")
    FileStats(st._1, st._2)
  }

  /** Footer stats for every path, keyed by file BASENAME (the key both
    * commit writers use — URIs percent-encode), decoded in a bounded
    * pool. */
  def forFiles(fs: FileSystem, paths: Seq[Path]): Map[String, FileStats] =
    if (paths.isEmpty) Map.empty
    else if (paths.lengthCompare(2) < 0)
      paths.map(p => p.getName -> read(fs, p)).toMap
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(paths.length, 8))
      try {
        val futs = paths.map { p =>
          p -> pool.submit(
            new java.util.concurrent.Callable[FileStats] {
              override def call(): FileStats = read(fs, p)
            })
        }
        futs.map { case (p, f) =>
          p.getName -> (try f.get()
          catch {
            case e: java.util.concurrent.ExecutionException =>
              throw e.getCause
          })
        }.toMap
      } finally pool.shutdownNow(): Unit
    }
}
