package graft.ext

import org.apache.hadoop.fs.{FileSystem, Path}
import graft.sources.FileManifest

/** Crash-replay INTENT records for the maintained indexes' ticks.
  *
  * A tick's takedown commits are merge-on-read deletes on the index's
  * own lakes — durable the moment they land. The change feed, however,
  * is an IMAGE diff: an id deleted in the crashed attempt's window and
  * identically re-inserted before the retry NETS TO NOTHING in the
  * replay's feed, so the replay would neither re-insert it nor know
  * the crashed takedown happened — the id would stay deleted in the
  * index forever while live in the corpus.
  *
  * The intent file closes that hole: BEFORE applying any takedown, a
  * tick records the ids it is about to touch under
  * `_state/intent-<from>-<nonce>.ids`. A replay from the same baseline
  * unions the pending intents into its own touched set and, for
  * intent ids the net feed no longer mentions, resets them and
  * re-inserts their image AT the target version — whatever partial
  * state any crashed attempt left, the result is the corpus' truth.
  * Intents clear once the tick's marker commits. Ids serialize as
  * strings; probe paths TRY-cast back to the key column's type (the
  * bloom machinery's standard literal discipline).
  */
private[ext] object IndexReplay {

  private def dir(stateDir: String) = new Path(stateDir)

  def record(fs: FileSystem, stateDir: String, from: Long,
             ids: Seq[Any]): Unit = {
    if (ids.isEmpty) return
    // one id per line — an id whose string form embeds a line break
    // would silently split into two bogus intents; fail loudly (no
    // sane vector/document key contains one)
    require(ids.forall { id =>
      val s = id.toString; !s.contains('\n') && !s.contains('\r')
    }, "index keys must not contain line breaks (intent records are " +
      "line-delimited)")
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    FileManifest.atomicWrite(fs,
      new Path(dir(stateDir), f"intent-$from%012d-$nonce.ids"),
      ids.map(_.toString).mkString("", "\n", "\n"))
  }

  /** Union of all pending intents recorded from baseline `from`. */
  def pending(fs: FileSystem, stateDir: String, from: Long): Seq[String] = {
    val d = dir(stateDir)
    if (!fs.exists(d)) return Nil
    val prefix = f"intent-$from%012d-"
    fs.listStatus(d).iterator
      .filter(s => s.isFile && s.getPath.getName.startsWith(prefix) &&
        s.getPath.getName.endsWith(".ids"))
      .flatMap(s => graft.sources.SidecarIO.readLines(fs, s.getPath))
      .filter(_.nonEmpty).toSeq.distinct.sorted
  }

  /** Drop every intent at or below `from` — the tick they guarded has
    * its marker committed (and older baselines can never replay). */
  def clear(fs: FileSystem, stateDir: String, from: Long): Unit = {
    val d = dir(stateDir)
    if (!fs.exists(d)) return
    fs.listStatus(d).iterator
      .filter { s =>
        val n = s.getPath.getName
        s.isFile && n.startsWith("intent-") && n.endsWith(".ids") &&
          n.stripPrefix("intent-").take(12).toLongOption.exists(_ <= from)
      }
      .foreach(s => fs.delete(s.getPath, false): Unit)
  }
}
