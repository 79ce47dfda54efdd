package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, count, lit, xxhash64}

/** Per-file BLOOM key index for the manifest lake — the point-lookup
  * companion to [[FileStats]]' min/max ranges. Range stats prune files
  * only after a [[History.clusterBy]] laid keys out contiguously; on an
  * UNCLUSTERED lake every file spans the whole key range and a keyed
  * read degenerates to a full scan. A per-file Bloom filter over the
  * key column prunes by CONTENT instead of by range: a takedown /
  * audit / point-lookup for k keys plans only the files whose filter
  * might contain one of them — on a 100 TB lake, O(files actually
  * holding the keys) + the filter's false-positive rate, regardless of
  * layout.
  *
  * Built with the engine's own native `bloom_build` aggregate in ONE
  * distributed job over the not-yet-indexed files (grouped by
  * `_metadata.file_path`), so refresh cost is O(new files), exactly
  * like [[FileStats.refresh]]. The driver-side collect is one
  * (path, filter-bytes) pair per NEW file — bounded by touched-file
  * count, never row data (~24 KB per file at the 20k/1% default).
  *
  * Sidecar format (`_stats/bloom-<col>.index`, atomic rename publish,
  * one line per file): {{{ <rel>\t<base64(filterBytes)> }}}
  * A corrupted line weakens pruning (file always planned), never
  * fails a read — same contract as the stats sidecar. Files without
  * an entry are ALWAYS planned, so the index can only save work,
  * never drop rows; [[History.readPinnedKeyed]] applies the exact
  * `IN` filter on top.
  *
  * The filter hashes `xxhash64(keyCol)` — the probe side MUST hash
  * identically, which [[probeHash]] guarantees by evaluating the same
  * Catalyst expression on the driver. */
object FileBloomIndex {

  def indexPath(lakePath: String, colName: String): String =
    s"$lakePath/_stats/bloom-$colName.index"

  /** Parse the sidecar: rel → serialized filter. Missing file → empty
    * (everything planned). Corrupted lines are skipped. */
  def read(fs: FileSystem, lakePath: String,
           colName: String): Map[String, Array[Byte]] = {
    val p = new Path(indexPath(lakePath, colName))
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty).toList
      finally in.close()
      lines.flatMap { l =>
        l.split('\t') match {
          case Array(rel, b64) =>
            scala.util.Try(
              rel -> java.util.Base64.getDecoder.decode(b64)).toOption
          case _ => None // corrupted line: weakens pruning, never fails
        }
      }.toMap
    }
  }

  private def publish(fs: FileSystem, lakePath: String, colName: String,
                      entries: Map[String, Array[Byte]]): Unit = {
    val dest = new Path(indexPath(lakePath, colName))
    val tmp = new Path(dest.getParent, dest.getName + ".tmp")
    fs.mkdirs(dest.getParent): Unit
    val out = fs.create(tmp, true)
    try {
      val sb = new StringBuilder
      entries.toSeq.sortBy(_._1).foreach { case (rel, bytes) =>
        sb.append(rel).append('\t')
          .append(java.util.Base64.getEncoder.encodeToString(bytes))
          .append('\n')
      }
      out.write(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } finally out.close()
    if (fs.exists(dest)) fs.delete(dest, false): Unit
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(s"bloom index publish failed: $dest")
  }

  /** The exact hash the index probes with: the same Catalyst
    * `xxhash64` the build job applied to the key column, evaluated on
    * the driver for one literal value. */
  def probeHash(value: Long): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64(
      Seq(org.apache.spark.sql.catalyst.expressions.Literal(value)), 42L)
      .eval(null).asInstanceOf[Long]

  /** Index every manifest-current file lacking an entry: one
    * distributed `bloom_build`-per-file job over just those files.
    * Returns the number of files newly indexed. Maintenance op — run
    * from the writer sequence like [[FileStats.refresh]]. */
  def refresh(spark: SparkSession, lakePath: String, colName: String,
              expectedPerFile: Long = 20000L, fpp: Double = 0.01): Int = {
    val root = new Path(lakePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = FileManifest.latest(fs, lakePath).getOrElse(
      throw new IllegalStateException(
        s"bloom index refresh needs a manifest-mode lake: $lakePath"))
    val have = read(fs, lakePath, colName)
    val qRoot = fs.makeQualified(root)
    val missing = m.cur.filterNot(have.contains)
    if (missing.isEmpty) return 0
    val relByAbs: Map[String, String] = missing.map(rel =>
      new Path(qRoot, rel).toString -> rel).toMap
    val fresh = spark.read
      .option("basePath", qRoot.toString)
      .parquet(missing.map(rel => new Path(qRoot, rel).toString): _*)
      .select(col("_metadata.file_path").as("__graft_fp"),
        xxhash64(col(colName)).as("__graft_h"))
      .groupBy(col("__graft_fp"))
      .agg(graft.functions.Bloom.bloom_build(
        col("__graft_h"), expectedPerFile, fpp).as("bf"),
        count(lit(1)).as("n"))
      .collect()
      .map { r =>
        val rel = relByAbs.getOrElse(new Path(r.getString(0)).toString,
          throw new IllegalStateException(
            s"indexed file not in the planned set: ${r.getString(0)}"))
        rel -> r.getAs[Array[Byte]]("bf")
      }.toMap
    // drop entries for files no longer live (cur or retired-awaiting-
    // vacuum may still serve pins — keep both, like the stats sidecar)
    val keep = m.curSet ++ m.retiredSet
    publish(fs, lakePath, colName,
      have.view.filterKeys(keep).toMap ++ fresh)
    fresh.size
  }
}
