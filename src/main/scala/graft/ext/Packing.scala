package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence PACKING and token-BUDGET selection — the last
  * preprocessing steps before tokenized documents become fixed-length
  * training sequences.
  *
  * Both operators are defined over a DETERMINISTIC token stream: per
  * (stratum, shard), documents concatenate in ascending id order and
  * every quantity derives from each document's exclusive running
  * start offset in that stream — one window cumulative sum, no
  * driver-side state, identical on any engine (the oracle recomputes
  * the same window in SQL).
  *
  * Scale: a window per (stratum, shard) is a sort of that partition's
  * docs. The SHARD column exists exactly so the sort parallelizes —
  * pack within (lang, doc_id mod 1024) and a 100 TB stratum becomes
  * 1024 independent streams, each a bounded sort, packed concurrently
  * with no cross-shard shuffle. Fully-global packing order is an
  * inherently sequential semantic; sharded streams are how real
  * pipelines parallelize it (each shard's bins pad/truncate
  * independently at training time).
  */
object Packing {

  /** The default token DENOMINATION: whitespace counts (DuckDB split
    * parity) — null text contributes zero tokens to its stream. Real
    * training runs pass [[graft.ext.Bpe.tokenCount]] with their
    * published merges instead (the `countTokens` hook below), so bins
    * and budgets measure what the model actually consumes. */
  private def wsTokensOf(textCol: Column): Column =
    when(textCol.isNull, lit(0L))
      .otherwise(TextAnalysis.wsTokenCount(textCol).cast("long"))

  /** The shared stream prelude: (id, stratum, shard, n_tokens) plus
    * each doc's EXCLUSIVE running start offset in its (stratum, shard)
    * stream — the one definition of "the token stream" both operators
    * derive from. */
  private def withStart(docs: DataFrame, idCol: String, textCol: String,
                        stratumCol: String, shardCol: Column,
                        countTokens: Column => Column): DataFrame =
    docs.select(col(idCol), col(stratumCol), shardCol.as("shard"),
        countTokens(col(textCol)).as("n_tokens"))
      .withColumn("start",
        coalesce(sum(col("n_tokens")).over(
          Window.partitionBy(col(stratumCol), col("shard"))
            .orderBy(col(idCol))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))

  /** Concat-then-chunk bin assignment: each doc occupies
    * [start, start + n_tokens) of its (stratum, shard) token stream;
    * training sequences are consecutive `seqLen`-token windows of that
    * stream. Emits per doc: n_tokens, the exclusive start offset, the
    * first and last bin the doc touches, and how many bins it spans —
    * everything a sequence writer needs to slice it. */
  def packBins(docs: DataFrame, idCol: String, textCol: String,
               stratumCol: String, shardCol: Column,
               seqLen: Long,
               countTokens: Column => Column = wsTokensOf): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    withStart(docs, idCol, textCol, stratumCol, shardCol, countTokens)
      .withColumn("bin_first", floor(col("start") / seqLen))
      .withColumn("bin_last",
        when(col("n_tokens") === 0L, floor(col("start") / seqLen))
          .otherwise(floor((col("start") + col("n_tokens") - 1L) / seqLen)))
      .withColumn("n_bins", col("bin_last") - col("bin_first") + 1L)
      .select(idCol, stratumCol, "shard", "n_tokens", "start",
        "bin_first", "bin_last", "n_bins")
  }

  /** Token-budget selection: per (stratum, shard) stream, keep
    * documents in ascending id order until the budget fills — a doc is
    * kept iff its exclusive start offset is still below `budget`, so
    * the boundary-crossing doc is INCLUDED (soft budget, the usual
    * convention: truncate at training time rather than undershoot).
    * Deterministic, engine-portable, one window. */
  def tokenBudget(docs: DataFrame, idCol: String, textCol: String,
                  stratumCol: String, shardCol: Column,
                  budget: Long,
                  countTokens: Column => Column = wsTokensOf): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    withStart(docs, idCol, textCol, stratumCol, shardCol, countTokens)
      .filter(col("start") < budget)
      .select(idCol, stratumCol, "shard", "n_tokens", "start")
  }
}
