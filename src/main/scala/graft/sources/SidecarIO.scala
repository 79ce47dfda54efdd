package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** Shared read path for the lake's small text artifacts (manifest
  * roots/shards, stats/bloom sidecars, schema log).
  *
  * All of them are IMMUTABLE once named — every writer stages and
  * renames, never patches in place — so a
  * [[org.apache.hadoop.fs.ChecksumException]] can only mean the
  * checksummed LOCAL filesystem's non-atomic rename pair: the data
  * file and its `.crc` sidecar move as two operations, and a reader
  * landing between them sees a stale sidecar. That window is exactly
  * what a concurrent commit's publish (or a maintenance agent's shard
  * rewrite) opens under `file://`; HDFS/S3 renames are single-object
  * and never enter this path. Re-reading converges once the pair
  * lands; a PERSISTENT mismatch is real corruption and is rethrown
  * after the bounded retries. */
private[graft] object SidecarIO {

  private def retrying[A](body: => A): A = {
    var attempt = 0
    while (true) {
      try return body
      catch {
        case e: org.apache.hadoop.fs.ChecksumException =>
          attempt += 1
          if (attempt >= 5) throw e
          Thread.sleep(10L * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Non-empty lines of a small text artifact. */
  def readLines(fs: FileSystem, p: Path): List[String] = retrying {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Whole content of a small text artifact. */
  def readString(fs: FileSystem, p: Path): String = retrying {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** First line, if the file has one. */
  def readFirstLine(fs: FileSystem, p: Path): Option[String] = retrying {
    val in = fs.open(p)
    try {
      val r = new java.io.BufferedReader(
        new java.io.InputStreamReader(in, "UTF-8"))
      Option(r.readLine())
    } finally in.close()
  }
}
