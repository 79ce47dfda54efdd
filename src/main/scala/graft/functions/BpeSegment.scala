package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass BPE segmentation — the vocabulary-scale upgrade
  * path [[graft.ext.Bpe]]'s scaladoc names: the k-nested-`replace`
  * chain is exact but costs k full string scans per row, which at a
  * real 30k-merge vocabulary is 30,000 scans of every document. This
  * node walks the MERGE TABLE once per word instead: adjacent-pair
  * ranks come from one hash lookup, and a monotone rank pointer
  * replays the chain exactly — find the lowest-ranked pair present at
  * or past the pointer, merge all its occurrences, advance past it
  * (see [[BpeTable]].segmentWord for why this, and not the classic
  * global-priority loop, is the chain-equivalent walk;
  * `BpeSegmentSpec`'s fuzz locks the equivalence from outside).
  *
  * Cost per row is O(word length × merges APPLIED), independent of
  * vocabulary size, plus a per-executor WORD CACHE (natural-language
  * tokens are Zipf-distributed — a few thousand distinct words cover
  * almost every row, so most words segment via one cache hit).
  *
  * Normalization is byte-identical to [[graft.ext.Bpe.unitStream]]:
  * `lower` via [[UTF8String.toLowerCase]] (the same call `lower()`
  * codegen makes), strip everything outside `[a-z ]`, single-space
  * word split. Stays inside whole-stage codegen: `doGenCode` emits a
  * direct call on the table reference object, like every graft
  * expression. */
case class BpeTokens(child: Expression, merges: Seq[(String, String)],
                     byteLevel: Boolean = false)
    extends UnaryExpression {

  @transient private lazy val table = new BpeTable(merges, byteLevel)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_tokens expects a string document, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    table.segment(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.segment($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeTokens = copy(child = newChild)
}

/** [[BpeTokens]]'s count-only sibling for the budgeting hot path:
  * sums segment lengths per word without materializing a token array
  * per row (the `size(tokens(…))` composition allocates a
  * GenericArrayData + one UTF8String per token just to count them). */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)],
                         byteLevel: Boolean = false)
    extends UnaryExpression {

  @transient private lazy val table = new BpeTable(merges, byteLevel)

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count expects a string document, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    table.count(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.count($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeTokenCount = copy(child = newChild)
}

/** The driver-built, executor-shared merge table: rank lookup for
  * adjacent unit pairs plus a bounded word-segmentation cache. One
  * instance rides the generated code's reference array (serialized
  * with the plan); the cache is transient and refills per executor.
  *
  * `byteLevel` switches the UNITIZATION only — the rank-pointer walk
  * is alphabet-independent. Byte mode mirrors
  * [[graft.ext.Bpe.byteUnitStream]] exactly: words split on the ASCII
  * class `[ \t\n\r]` (those four byte values never occur inside a
  * multi-byte UTF-8 sequence — continuation bytes are ≥ 0x80 — so
  * splitting on raw bytes is UTF-8-safe), units are 2-char
  * lowercase-hex byte spellings, nothing is normalized away. */
final class BpeTable(merges: Seq[(String, String)],
                     byteLevel: Boolean = false) extends Serializable {

  // word-crossing rules (left unit is or ends with the word marker)
  // are refused: the trainer never produces them (Bpe.train excludes
  // the candidates), and their absence is exactly what makes per-WORD
  // segmentation equal to the whole-stream replace chain
  require(merges.forall { case (l, _) =>
    l != "</w>" && !l.endsWith("</w>") },
    "BPE merge table contains a word-crossing rule (left unit ends " +
      "with </w>) — merges must not glue words")

  // array-backed for the hot loop: the caller's Seq may be a linear
  // List, where `size` and `apply(best)` are O(vocab) walks — exactly
  // the vocabulary-proportional cost this expression exists to remove
  private val mergesArr: Array[(String, String)] = merges.toArray

  /** (left SPACE right) → ALL its ranks, ascending. A space can never
    * appear in a unit (units are `[a-z]`+ or `</w>` by the shared
    * normalization), so the key is collision-free. Every rank is kept,
    * not just the first: the same pair can legally recur in a table
    * (a middle rule rebuilding a constituent spelling re-creates it),
    * and the chain applies the later occurrence again — so must the
    * pointer walk. */
  private val rank: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      val k = l + " " + r
      val prev = m.get(k)
      m.put(k, if (prev == null) Array(i) else prev :+ i): Unit
    }
    m
  }

  private val cacheCap = 1 << 16
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()

  // 256 interned hex-pair symbols — byte-mode units alias these, so a
  // word's unit array allocates no per-byte strings
  private val byteSyms: Array[String] =
    Array.tabulate(256)(i => f"$i%02x")

  /** Segment one document: unitize (per the table's mode), per-word
    * rank-pointer merge, concatenate. Called from generated code. */
  def segment(text: UTF8String): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Any](16)
    if (byteLevel) eachByteWord(text) { toks =>
      var j = 0
      while (j < toks.length) { out += UTF8String.fromString(toks(j)); j += 1 }
    } else eachCharWord(text) { toks =>
      var j = 0
      while (j < toks.length) { out += UTF8String.fromString(toks(j)); j += 1 }
    }
    new GenericArrayData(out.toArray)
  }

  /** Token count without materializing the array — the budgeting hot
    * path. */
  def count(text: UTF8String): Long = {
    var total = 0L
    if (byteLevel) eachByteWord(text)(toks => total += toks.length)
    else eachCharWord(text)(toks => total += toks.length)
    total
  }

  /** Letter-mode word iteration — identical to lower() +
    * regexp_replace('[^a-z ]','') + split(' '). */
  private def eachCharWord(text: UTF8String)
                          (f: Array[String] => Unit): Unit = {
    val norm = text.toLowerCase.toString
    val word = new java.lang.StringBuilder(16)
    var i = 0
    val n = norm.length
    while (i <= n) {
      val ch = if (i < n) norm.charAt(i) else ' '
      if (ch == ' ') {
        if (word.length > 0) { f(segmentWord(word.toString)); word.setLength(0) }
      } else if (ch >= 'a' && ch <= 'z') word.append(ch)
      i += 1
    }
  }

  /** Byte-mode word iteration: raw UTF-8 bytes, split on the ASCII
    * pre-tokenizer bytes, hex-pair units — nothing erased. */
  private def eachByteWord(text: UTF8String)
                          (f: Array[String] => Unit): Unit = {
    val bytes = text.getBytes
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      val sep = i == bytes.length || {
        val b = bytes(i)
        b == ' '.toByte || b == '\t'.toByte || b == '\n'.toByte ||
          b == '\r'.toByte
      }
      if (sep) {
        if (i > start) f(segmentByteWord(bytes, start, i))
        start = i + 1
      }
      i += 1
    }
  }

  private def segmentByteWord(bytes: Array[Byte], from: Int,
                              until: Int): Array[String] = {
    // cache key: the raw word bytes, latin-1-decoded (bijective on
    // bytes, so distinct words cannot collide)
    val key = new String(bytes, from, until - from,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val hit = cache.get(key)
    if (hit != null) return hit
    val units = new Array[String](until - from + 1)
    var i = from
    var j = 0
    while (i < until) { units(j) = byteSyms(bytes(i) & 0xff); i += 1; j += 1 }
    units(j) = "</w>"
    val res = walk(units)
    if (cache.size() >= cacheCap) cache.clear()
    cache.put(key, res): Unit
    res
  }

  /** One word's segmentation, cached: char units + `</w>`, then walk
    * the table with a MONOTONE RANK POINTER: find the lowest-ranked
    * pair present AT OR PAST the pointer, merge all its occurrences
    * (one left-to-right pass IS exhaustion — the merged symbol is
    * longer than either constituent, so it can never re-form its own
    * pair), advance the pointer past that rank, repeat. Skipping an
    * absent rule is exactly the chain's no-op replace, so this equals
    * the rank-ordered exhaustive-replace chain BY CONSTRUCTION —
    * unlike the classic "merge the globally lowest-ranked pair
    * anywhere, repeat" loop, which diverges when a LATER rule rebuilds
    * a symbol string an earlier rule consumes (two merge paths to one
    * spelling, e.g. `a+bc` and `ab+c` both spelling `abc`): the chain
    * never revisits a passed rule, so neither does this. */
  private def segmentWord(w: String): Array[String] = {
    val hit = cache.get(w)
    if (hit != null) return hit
    val units = new Array[String](w.length + 1)
    var i = 0
    while (i < w.length) { units(i) = String.valueOf(w.charAt(i)); i += 1 }
    units(w.length) = "</w>"
    val res = walk(units)
    if (cache.size() >= cacheCap) cache.clear()
    cache.put(w, res): Unit
    res
  }

  /** The MONOTONE RANK POINTER walk over one word's unit array —
    * alphabet-independent (see the class doc of the letter path for
    * the chain-equivalence argument; byte mode reuses it verbatim,
    * hex symbols being just another space-free alphabet). */
  private def walk(units0: Array[String]): Array[String] = {
    var units = units0
    var i = 0
    var minRank = 0
    while (minRank < mergesArr.length && units.length >= 2) {
      // lowest-ranked adjacent pair present at or past the pointer
      var best = Integer.MAX_VALUE
      i = 0
      while (i < units.length - 1) {
        val rs = rank.get(units(i) + " " + units(i + 1))
        if (rs != null) {
          // smallest rank at or past the pointer (ranks ascend; dup
          // lists are tiny, a linear skip beats a search)
          var j = 0
          while (j < rs.length && rs(j) < minRank) j += 1
          if (j < rs.length && rs(j) < best) best = rs(j)
        }
        i += 1
      }
      if (best == Integer.MAX_VALUE) minRank = mergesArr.length
      else {
        // merge every occurrence of the best pair, left to right,
        // non-overlapping — exactly the exhaustive single-rule pass
        val (l, r) = (mergesArr(best)._1, mergesArr(best)._2)
        val next = new Array[String](units.length)
        var src = 0
        var dst = 0
        while (src < units.length) {
          if (src < units.length - 1 && units(src) == l &&
              units(src + 1) == r) {
            next(dst) = l + r; src += 2
          } else { next(dst) = units(src); src += 1 }
          dst += 1
        }
        units = java.util.Arrays.copyOf(next, dst)
        minRank = best + 1
      }
    }
    units
  }
}

/** SQL-surface builders for `bpe_tokens` / `bpe_token_count`
  * (VERDICT r19 #6: the flagship expression was DataFrame-API-only).
  * Registered through the canonical [[GraftFunctions]] list like
  * every sketch function.
  *
  * Signature: `bpe_tokens(text, merges[, mode])` where `merges` is a
  * FOLDABLE string — either inline rules `'l r;l2 r2;…'` (rank
  * order, the [[graft.ext.Bpe.saveMerges]] rows flattened) or
  * `'@<path>'` to resolve the published merges artifact via
  * [[graft.ext.Bpe.loadMerges]] at plan time (the table rides into
  * the plan as driver-built literals either way, exactly like the
  * DataFrame path). `mode` is `'chars'` (default — the normalized
  * letter alphabet) or `'bytes'` (byte-level, nothing erased). */
object BpeSql {

  import org.apache.spark.sql.types.StringType

  private def foldString(e: Expression, what: String): String = {
    require(e.foldable && e.dataType == StringType,
      s"BPE $what must be a foldable string literal, got ${e.sql}")
    val v = e.eval()
    require(v != null, s"BPE $what must not be NULL")
    v.toString
  }

  private[graft] def parseMerges(spec: String): Seq[(String, String)] =
    if (spec.startsWith("@"))
      graft.ext.Bpe.loadMerges(
        org.apache.spark.sql.SparkSession.active, spec.drop(1))
    else spec.split(";").iterator.map(_.trim).filter(_.nonEmpty).map {
      rule =>
        rule.split("\\s+") match {
          case Array(l, r) => (l, r)
          case _ => throw new IllegalArgumentException(
            s"bad BPE merge rule '$rule' — expected 'left right'")
        }
    }.toSeq

  private def byteMode(exprs: Seq[Expression]): Boolean =
    if (exprs.length < 3) false
    else foldString(exprs(2), "mode") match {
      case "bytes" => true
      case "chars" => false
      case m => throw new IllegalArgumentException(
        s"BPE mode must be 'chars' or 'bytes', got '$m'")
    }

  private def checkArity(exprs: Seq[Expression], name: String): Unit =
    require(exprs.length == 2 || exprs.length == 3,
      s"$name(text, merges[, mode]) takes 2 or 3 arguments, " +
        s"got ${exprs.length}")

  def tokensBuilder(exprs: Seq[Expression]): Expression = {
    checkArity(exprs, "bpe_tokens")
    BpeTokens(exprs.head, parseMerges(foldString(exprs(1), "merges")),
      byteMode(exprs))
  }

  def countBuilder(exprs: Seq[Expression]): Expression = {
    checkArity(exprs, "bpe_token_count")
    BpeTokenCount(exprs.head, parseMerges(foldString(exprs(1), "merges")),
      byteMode(exprs))
  }
}
