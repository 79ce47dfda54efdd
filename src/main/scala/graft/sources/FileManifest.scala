package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** Versioned per-file manifests for the history lake — the minimal slice
  * of a table format that closes the last reader race
  * ([[History.readSnapshot]] pins directories at LISTING time, so a
  * compaction swap completing under a long scan still moves files out
  * from under it).
  *
  * Invariants (manifest mode, opt-in via [[History.enableManifests]]):
  *
  *  - '''Data files are immutable and immobile.''' A writer only ever
  *    ADDS files (unique names) and a vacuum only ever DELETES files
  *    past their grace window; nothing is renamed once published. A
  *    reader that planned from manifest vN can finish its scan after
  *    any number of later commits, because every file vN references is
  *    still at its path until a vacuum's grace period says otherwise.
  *  - '''The manifest is the commit point and the source of truth.'''
  *    `v<version>.manifest` lists the CURRENT file set and the RETIRED
  *    set (superseded files awaiting vacuum, with their retirement
  *    timestamp). Publishing is write-tmp-then-rename — atomic on
  *    HDFS/local — and readers resolve the highest version, so a crash
  *    between data-file writes and the manifest publish leaves only
  *    invisible orphans (vacuumed later), never a partial commit.
  *  - '''Single writer per lake''' (same discipline as
  *    [[History.compactLatest]]): versions advance by one per commit;
  *    concurrent committers would race the version file and fail loudly
  *    on the rename, not corrupt state.
  *
  * File format (one line per entry, tab-separated):
  * {{{
  *   cur\t<region=R/dt=D/file.parquet>
  *   ret\t<retiredAtEpochMs>\t<region=R/dt=D/file.parquet>
  * }}}
  *
  * Scale note: one manifest line per live data file — a 100 TB lake at
  * healthy file sizes is ~10⁵–10⁶ lines. Published versions are
  * immutable, so parses are cached per (lake, version): a session pays
  * the driver-side read once per version it touches, not once per plan
  * (bounded LRU; see `parsedCache`). A full table format additionally
  * shards manifests per partition; this deliberately stays one flat
  * file per version (the lake's partition count already bounds it) and
  * keeps only unvacuumed versions on disk.
  */
object FileManifest {

  def manifestDir(lakePath: String): String = s"$lakePath/_manifests"

  case class Manifest(version: Long, cur: Seq[String],
                      retired: Seq[(Long, String)]) {
    def curSet: Set[String] = cur.toSet
    def retiredSet: Set[String] = retired.map(_._2).toSet
  }

  private def versionPath(lakePath: String, v: Long): Path =
    new Path(manifestDir(lakePath), f"v$v%012d.manifest")

  private def parseVersion(name: String): Option[Long] =
    if (name.startsWith("v") && name.endsWith(".manifest"))
      scala.util.Try(
        name.stripPrefix("v").stripSuffix(".manifest").toLong).toOption
    else None

  /** Manifest mode is on iff at least one version file exists. */
  def enabled(fs: FileSystem, lakePath: String): Boolean =
    latestVersion(fs, lakePath).isDefined

  def latestVersion(fs: FileSystem, lakePath: String): Option[Long] = {
    val dir = new Path(manifestDir(lakePath))
    if (!fs.exists(dir)) None
    else {
      val vs = fs.listStatus(dir).iterator
        .flatMap(s => parseVersion(s.getPath.getName))
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  /** Every manifest version still on disk (ascending) — the time-travel
    * horizon: versions vanish only when [[History.vacuum]]'s grace
    * window retires them. */
  def versions(fs: FileSystem, lakePath: String): Seq[Long] = {
    val dir = new Path(manifestDir(lakePath))
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).iterator
      .flatMap(s => parseVersion(s.getPath.getName)).toSeq.sorted
  }

  /** Read one specific retained version (time travel), or None if that
    * version never existed or was vacuumed. */
  def at(fs: FileSystem, lakePath: String, version: Long): Option[Manifest] =
    if (fs.exists(versionPath(lakePath, version)))
      Some(readVersion(fs, lakePath, version))
    else None

  /** Read the highest-version manifest, or None when manifest mode is
    * off for this lake. */
  def latest(fs: FileSystem, lakePath: String): Option[Manifest] =
    latestVersion(fs, lakePath).map(v => readVersion(fs, lakePath, v))

  /** Parsed-manifest cache. A published `v<N>.manifest` never changes
    * in place, but the LAKE can be wiped and rebuilt at the same path
    * (version numbering restarts) — so the key carries the manifest
    * file's (mtime, length) alongside (qualified root, version): a
    * rebuilt lake's v1 is a different file and misses the dead lake's
    * entry. The status probe is one metadata RTT per plan; the win is
    * skipping the ~10⁵–10⁶-line read+parse (every pinned read,
    * stats-pruned read, expiry and vacuum resolves the manifest).
    * Bounds: entry-count LRU AND a total parsed-line budget — at 100 TB
    * one manifest is tens of MB of path strings, so a count-only cap
    * could pin GBs of driver heap. */
  private val cacheCap = 64
  private val cacheMaxLines = 1000000L
  private type CacheKey = (String, Long, Long, Long)
  private val parsedCache =
    new java.util.LinkedHashMap[CacheKey, Manifest](16, 0.75f, true)
  private var cachedLines = 0L
  private def weight(m: Manifest): Long = (m.cur.size + m.retired.size + 1).toLong
  /** Physical manifest-file reads (cache misses) — exposed so the scale
    * spec can assert the second read of a version is served from cache. */
  private[graft] val manifestFileReads =
    new java.util.concurrent.atomic.AtomicLong(0)

  private def readVersion(fs: FileSystem, lakePath: String,
                          v: Long): Manifest = {
    val vp = versionPath(lakePath, v)
    val st = fs.getFileStatus(vp) // FileNotFoundException like open would
    val key = (fs.makeQualified(new Path(lakePath)).toString, v,
      st.getModificationTime, st.getLen)
    val cached = parsedCache.synchronized(Option(parsedCache.get(key)))
    cached.getOrElse {
      manifestFileReads.incrementAndGet(): Unit
      val in = fs.open(vp)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty).toList
      finally in.close()
      val cur = scala.collection.mutable.ArrayBuffer.empty[String]
      val ret = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
      lines.foreach { l =>
        l.split('\t') match {
          case Array("cur", rel) => cur += rel
          case Array("ret", ts, rel) => ret += ((ts.toLong, rel))
          case other => throw new java.io.IOException(
            s"bad manifest line in v$v: ${other.mkString("\\t")}")
        }
      }
      val m = Manifest(v, cur.toSeq, ret.toSeq)
      parsedCache.synchronized {
        val prev = parsedCache.put(key, m)
        if (prev != null) cachedLines -= weight(prev) // racing re-parse
        cachedLines += weight(m)
        // evict least-recently-used until within BOTH bounds
        val it = parsedCache.entrySet().iterator()
        while ((parsedCache.size() > cacheCap ||
            cachedLines > cacheMaxLines) && it.hasNext) {
          cachedLines -= weight(it.next().getValue)
          it.remove()
        }
      }
      m
    }
  }

  /** Atomically publish `m` as the next version. Fails loudly (never
    * corrupts) if the version already exists — two writers raced, which
    * the single-writer contract forbids. */
  def publish(fs: FileSystem, lakePath: String, m: Manifest): Unit = {
    val dest = versionPath(lakePath, m.version)
    if (fs.exists(dest))
      throw new java.io.IOException(
        s"manifest version collision at $dest: two writers raced " +
          "(single writer per lake)")
    val tmp = new Path(dest.getParent, dest.getName + s".tmp")
    fs.mkdirs(dest.getParent): Unit
    val out = fs.create(tmp, true)
    try {
      val sb = new StringBuilder
      m.cur.sorted.foreach(rel => sb.append("cur\t").append(rel).append('\n'))
      m.retired.sortBy(_._2).foreach { case (ts, rel) =>
        sb.append("ret\t").append(ts).append('\t').append(rel).append('\n')
      }
      out.write(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } finally out.close()
    // commit via FileContext.rename (default Rename.NONE): it FAILS if
    // the destination exists, atomically — the exists() check above is
    // only a fast path, because FileSystem.rename on local/POSIX
    // silently REPLACES an existing destination, so two racing writers
    // (a zombie driver + its restarted replacement) passing the check
    // together would otherwise let the second silently overwrite the
    // first's commit and orphan its data files for the next vacuum.
    try {
      org.apache.hadoop.fs.FileContext
        .getFileContext(fs.makeQualified(dest).toUri, fs.getConf)
        .rename(fs.makeQualified(tmp), fs.makeQualified(dest))
    } catch {
      case e: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        // no FileContext binding for this scheme: fall back to the
        // plain rename (best effort — the exists check above still
        // guards the common case)
        if (!fs.rename(tmp, dest))
          throw new java.io.IOException(
            s"manifest publish failed: $dest", e)
      case e: java.io.IOException =>
        throw new java.io.IOException(
          s"manifest version collision or publish failure at $dest: " +
            "two writers raced (single writer per lake)", e)
    }
  }

  /** Commit `added` (lake-relative file paths) as new current files —
    * the archive's per-batch manifest add. Idempotent for a replayed
    * batch: already-current paths dedupe away and no new version is
    * published when nothing changes. */
  def addFiles(fs: FileSystem, lakePath: String,
               added: Seq[String]): Unit = {
    val m = latest(fs, lakePath).getOrElse(
      throw new IllegalStateException(
        s"addFiles on a lake without manifests: $lakePath"))
    val fresh = added.filterNot(m.curSet)
    if (fresh.nonEmpty)
      publish(fs, lakePath,
        Manifest(m.version + 1, m.cur ++ fresh, m.retired))
  }

  /** List the two-level (`region=…/dt=…`-shaped) partition dirs under
    * `qRoot` as relative paths — hidden (`_`/`.`) segments excluded at
    * EVERY level, sorted. The one shared listing primitive for every
    * lake walker (snapshot reads, stats, vacuum, compaction staging,
    * manifest bootstrap) so hidden-file and depth handling can never
    * drift between them again. */
  def listPartitionDirs(fs: FileSystem, qRoot: Path): Seq[String] =
    Option(fs.globStatus(new Path(qRoot, "*/*")))
      .getOrElse(Array.empty)
      .filter(_.isDirectory)
      .map(s => qRoot.toUri.relativize(s.getPath.toUri).getPath)
      .filterNot(_.split('/')
        .exists(seg => seg.startsWith("_") || seg.startsWith(".")))
      .sorted.toSeq

  /** List the non-hidden data files of one partition dir, as names. */
  def listDataFiles(fs: FileSystem, dir: Path): Seq[String] =
    fs.listStatus(dir)
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(_.getPath.getName).sorted.toSeq

  /** Recursively list every non-hidden data file under `qRoot` — ANY
    * partition depth including none — as qRoot-relative paths. Hidden
    * segments (`_staging`, `_manifests`, `_ledger`, `.…`) prune whole
    * subtrees. */
  def walkDataFiles(fs: FileSystem, qRoot: Path): Seq[String] = {
    def walk(p: Path): Seq[Path] =
      fs.listStatus(p).toSeq.flatMap { s =>
        val n = s.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Nil
        else if (s.isDirectory) walk(s.getPath)
        else Seq(s.getPath)
      }
    walk(qRoot).map(p => qRoot.toUri.relativize(p.toUri).getPath).sorted
  }

  /** List every live (non-hidden) data file under the lake, as
    * lake-relative paths — any partition layout (the `region=…/dt=…`
    * two-level lake, single-level, or unpartitioned). */
  def listLiveFiles(fs: FileSystem, lakePath: String): Seq[String] =
    walkDataFiles(fs, fs.makeQualified(new Path(lakePath)))
}
