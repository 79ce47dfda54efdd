package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-training-data pipelines (SURVEY.md §7.4):
  * tokenization, quality scoring, language-ID heuristic, fingerprinting.
  *
  * Everything is a builtin codegen'd column expression — no UDFs — so the
  * operators inline into whole-stage codegen and scale linearly with data
  * (pure map-side, zero shuffle until the caller aggregates).
  */
object TextAnalysis {

  /** Whitespace tokens (exact split parity with the DuckDB oracle:
    * consecutive separators produce empty tokens on both sides). */
  def wsTokens(text: Column): Column = split(text, " ")

  def wsTokenCount(text: Column): Column = size(wsTokens(text))

  /** BPE-ish subword proxy: runs of letters, runs of digits, or single
    * non-alphanumeric glyphs. */
  val bpeTokenPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeTokenPattern), lit(0)))

  /** Occurrences of a literal substring — (len - len(without)) / len(sub),
    * expressible identically in Spark and DuckDB. */
  def substrCount(text: Column, sub: String): Column =
    ((length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(sub), ""))) /
      sub.length).cast("int")

  /** Language-ID heuristic: argmax over per-language stopword-marker hit
    * counts with a deterministic first-match tiebreak (en,de,es,fr,zh). */
  val langMarkers: Seq[(String, String)] = Seq(
    "en" -> " the ", "de" -> " der ", "es" -> " el ", "fr" -> " le ",
    "zh" -> "的")

  def langScores(text: Column): Seq[(String, Column)] =
    langMarkers.map { case (lang, m) => lang -> substrCount(text, m) }

  def predictedLang(text: Column): Column = {
    val scores = langScores(text)
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lang).otherwise(acc)
    }
  }

  /** Quality score ∈ [0,1]: stopword ratio + length credit + punctuation
    * penalty (SURVEY §7.4 quality scoring). Formula is replicated verbatim
    * in the oracle; all arithmetic is int-derived IEEE double. */
  def qualityScore(text: Column): Column = {
    val nTok = wsTokenCount(text).cast("double")
    val stopHits = (substrCount(text, " the ") + substrCount(text, " a ") +
      substrCount(text, " of ")).cast("double")
    val punct = (substrCount(text, ".") + substrCount(text, ",")).cast("double")
    round(
      lit(0.4) * least(lit(1.0), stopHits / nTok * 10.0) +
        lit(0.3) * least(lit(1.0), nTok / 100.0) +
        lit(0.3) * (lit(1.0) - least(lit(1.0), punct / nTok * 5.0)),
      4)
  }

  /** Word n-gram shingles; short texts fall back to the whole text as one
    * shingle.
    *
    * Implementation note: built as a zip_with chain over shifted slices so
    * every array argument is evaluated ONCE per row. The naive
    * `transform(sequence, i -> element_at(split(text), i+k))` form
    * re-evaluates the split per lambda element — O(words²) per document,
    * measured ~5 s for 5 k docs vs ~0.3 s for this form. Trailing
    * partial windows null out through concat and are filtered. */
  def wordShingles(text: Column, n: Int): Column = {
    val ws = wsTokens(text)
    val zipped = (1 until n).foldLeft(ws) { (acc, k) =>
      zip_with(acc, slice(ws, lit(k + 1), size(ws)),
        (a, b) => concat(a, lit(" "), b))
    }
    when(size(ws) >= n, filter(zipped, x => x.isNotNull))
      .otherwise(array(text))
  }

  /** Position-PRESERVING word n-grams: element i (0-based) of the
    * result is the n-gram starting at word i+1, and the trailing
    * i > len−n entries are NULL (partial windows) — callers
    * `posexplode` and drop the NULLs, keeping the 1-based start
    * position as `pos + 1`. [[wordShingles]] filters the partials out
    * and so loses positions; the exact-substring span machinery (t29)
    * needs them to merge overlapping duplicate grams into maximal
    * islands. Same single-evaluation zip_with chain as
    * [[wordShingles]] (O(n·k) per doc — never the O(n²)
    * transform(sequence, i -> slice) shape; see the note there).
    * Takes the ALREADY-split word array, not the text, so one split
    * serves both this and the caller's length guard. */
  def positionalShingles(words: Column, n: Int): Column =
    (1 until n).foldLeft(words) { (acc, k) =>
      zip_with(acc, slice(words, lit(k + 1), size(words)),
        (a, b) => concat(a, lit(" "), b))
    }

  /** Within-document repetition: fraction of duplicated entries in a
    * pre-projected gram array (Gopher-style repetitiveness signal: 0 =
    * all grams distinct, → 1 as text degenerates into loops). Takes the
    * ALREADY-projected gram column, not the text — expressions get no
    * CSE, so referencing `wordShingles(text, n)` twice would rebuild
    * the shingle array twice per row. */
  def repetitionRatio(grams: Column): Column =
    round(lit(1.0) -
      size(array_distinct(grams)).cast("double") /
        size(grams).cast("double"), 4)

  /** Context-window chunking for training-data packing: overlapping
    * token windows of `window` tokens stepping `window - overlap`, the
    * standard fixed-size chunker. Pure array expressions (sequence +
    * slice), zero shuffle — one input row explodes to ceil(n/step)
    * chunk rows via the caller's posexplode. */
  def tokenChunks(text: Column, window: Int, overlap: Int): Column = {
    require(overlap < window, "overlap must be smaller than window")
    val step = window - overlap
    val toks = wsTokens(text)
    // guard the sequence upper bound: for null text size(toks) is
    // null/-1 and sequence(0, -2, step) throws at runtime, failing the
    // whole job on one null document — null docs chunk to empty
    val chunks = transform(
      sequence(lit(0), greatest(size(toks) - 1, lit(0)), lit(step)),
      st => array_join(slice(toks, st + 1, lit(window)), " "))
    when(text.isNull, array().cast("array<string>")).otherwise(chunks)
  }

  /** PII patterns for corpus redaction. Kept RE2-compatible (no
    * backrefs/lookaround) so the exact same patterns run in RE2-based
    * engines — and in the DuckDB oracle. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val longNumPattern = "\\d{6,}"

  /** Training-corpus PII redaction: emails, then long digit runs (ids,
    * phone-ish numbers), replaced with typed placeholder tokens. Pure
    * codegen'd regexp_replace — shuffle-free, scales with the scan. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, emailPattern, "<EMAIL>"),
      longNumPattern, "<NUM>")

  /** Document fingerprint: minimum md5 over word-5-gram shingles — the
    * min-sampling ("winnowing"-flavored) rolling-hash fingerprint
    * (SURVEY §7.4). Identical docs ⇒ identical fingerprints; near-identical
    * docs usually share them. */
  def fingerprint(text: Column): Column =
    array_min(transform(wordShingles(text, 5), s => md5(s)))

  /** Deterministic stratified sampling predicate — the data-MIXING
    * primitive (hold each stratum at a target keep rate when composing a
    * training corpus). The keep decision is an md5 bucket of the row id
    * against `rate · 2³²`, like the t13 split: engine-portable, stable
    * under stage retry (a `rand()` sample resamples on retry — the
    * SPARK-23207 class), and independent of partitioning. Strata absent
    * from `rates` are dropped (rate 0). Shuffle-free: evaluates as a
    * scan-side filter. */
  /** Engine-portable uniform hash bucket of a row id: first 8 hex chars
    * of md5 as a bigint in [0, 2³²). The ONE definition behind both the
    * t13 deterministic split (`bucket % 10`) and [[stratifiedKeep]] —
    * DuckDB mirror: `('0x' || substr(md5(CAST(id AS VARCHAR)),1,8))::BIGINT`. */
  def md5Bucket(idCol: Column): Column =
    graft.functions.Md5Prefix.md5_prefix(idCol.cast("string"), 8)

  def stratifiedKeep(idCol: Column, stratumCol: Column,
                     rates: Map[String, Double]): Column = {
    val rate = rates.foldLeft(lit(0.0)) { case (acc, (stratum, r)) =>
      when(stratumCol === stratum, lit(r)).otherwise(acc)
    }
    md5Bucket(idCol) < rate * 4294967296.0
  }

  /** Token-budget shard assignment (t08): docs ordered by `ordCol`
    * within each `keyCol` are packed into shards of `budget` tokens by
    * the exclusive running prefix sum of `tokCol` — the "cut a source
    * into ~2000-token training shards" step.
    *
    * Default plan: one ordered window per key — right when keys are
    * many (the window partition bounds state and keys parallelize).
    * `blockOrds` is the FEW-KEYS scale escape: a single giant key would
    * serialize its whole running sum through one task, so the prefix
    * sum goes two-level — docs window over (key, block) partitions
    * (block = ordCol / blockOrds, bounded state), block TOTALS window
    * over the #key·#block summary rows (tiny), and the exclusive
    * running sum is within-block + carried block offset. Exact prefix
    * sums either way: chunked ≡ unchunked on any input
    * (`TextRobustnessSpec` proves it on randomized data).
    *
    * Output: input columns + `shard` (int, 0-based per key). */
  def tokenShards(docs: DataFrame, keyCol: String, ordCol: String,
                  tokCol: String, budget: Double,
                  blockOrds: Option[Long] = None): DataFrame =
    blockOrds match {
      case None =>
        val w = Window.partitionBy(col(keyCol)).orderBy(col(ordCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        docs.withColumn("shard",
          floor((sum(col(tokCol)).over(w) - col(tokCol))
            .cast("double") / budget).cast("int"))
      case Some(n) =>
        require(n > 0, s"blockOrds must be positive, got $n")
        val blocked = docs.withColumn("_block", floor(col(ordCol) / lit(n)))
        val wIn = Window.partitionBy(col(keyCol), col("_block"))
          .orderBy(col(ordCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wOff = Window.partitionBy(col(keyCol)).orderBy(col("_block"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val offsets = blocked.groupBy(col(keyCol), col("_block"))
          .agg(sum(col(tokCol)).as("_blockTotal"))
          .select(col(keyCol), col("_block"),
            coalesce(sum(col("_blockTotal")).over(wOff), lit(0L))
              .as("_offset"))
        blocked
          .withColumn("_within", sum(col(tokCol)).over(wIn))
          .join(offsets, Seq(keyCol, "_block"))
          .withColumn("shard",
            floor((col("_within") + col("_offset") - col(tokCol))
              .cast("double") / budget).cast("int"))
          .drop("_block", "_within", "_offset")
    }
}
