package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.IncrementalRollup

/** MAINTAINED language-model count tables over a live corpus lake —
  * the model side of the bigram-LM quality filter (gate t25) kept in
  * sync with the corpus the way s14/s15 maintain the vector and
  * lexical indexes: unigram/bigram counts bootstrap once with a full
  * scan, then every change-feed tick retracts the grams of deleted
  * documents and adds the grams of appended ones — a takedown or an
  * append updates the model at the cost of the CHANGED documents,
  * never a corpus rescan. Counts are group-invertible, so the model is
  * exact at every version (not an approximation that drifts), and a
  * scoring job joins the corpus' bigram stream against these tables
  * exactly as t25 does against its one-shot counts.
  *
  * The derives are row-local by construction (filter + split +
  * explode over ONE text column), which is the invertibility
  * contract [[IncrementalRollup.tickDerived]] requires. Token/bigram
  * semantics match the t25 gate: whitespace split, documents with < 2
  * tokens contribute no bigrams, blank/null texts contribute nothing.
  */
object LmRollup {

  /** Row-local unigram stream: one `w` row per whitespace token. */
  def unigramDerive(textCol: String): DataFrame => DataFrame = df =>
    df.filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(explode(split(col(textCol), " ")).as("w"))

  /** Row-local bigram stream: one (`w1`, `w2`) row per adjacent token
    * pair. */
  def bigramDerive(textCol: String): DataFrame => DataFrame = df =>
    df.filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(split(col(textCol), " ").as("l"))
      .filter(size(col("l")) >= 2)
      .select(explode(zip_with(
        slice(col("l"), lit(1), size(col("l")) - 1),
        slice(col("l"), lit(2), size(col("l")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))

  def bootstrapUnigrams(spark: SparkSession, lakePath: String,
                        rollupDir: String, textCol: String): Long =
    IncrementalRollup.bootstrapDerived(spark, lakePath, rollupDir,
      Seq("w"), unigramDerive(textCol))

  def tickUnigrams(spark: SparkSession, lakePath: String,
                   rollupDir: String, textCol: String): Option[(Long, Long)] =
    IncrementalRollup.tickDerived(spark, lakePath, rollupDir,
      Seq("w"), unigramDerive(textCol))

  def bootstrapBigrams(spark: SparkSession, lakePath: String,
                       rollupDir: String, textCol: String): Long =
    IncrementalRollup.bootstrapDerived(spark, lakePath, rollupDir,
      Seq("w1", "w2"), bigramDerive(textCol))

  def tickBigrams(spark: SparkSession, lakePath: String,
                  rollupDir: String, textCol: String): Option[(Long, Long)] =
    IncrementalRollup.tickDerived(spark, lakePath, rollupDir,
      Seq("w1", "w2"), bigramDerive(textCol))

  /** The maintained count table at its current version:
    * (w, n_rows) or (w1, w2, n_rows). */
  def read(spark: SparkSession, rollupDir: String): DataFrame =
    IncrementalRollup.read(spark, rollupDir)

  /** SERVE the t25 bigram-LM quality score from the MAINTAINED model:
    * each doc's mean negative log-likelihood under add-one smoothing,
    * with c12 from the bigram table, context counts derived from it
    * (one vocabulary-sized aggregation — no corpus scan), and the
    * vocabulary size from the unigram table's row count. Unseen
    * bigrams/contexts score through the smoothing (left joins,
    * coalesce 0) — the path that scores NEW candidate documents
    * against the live model. Per-position log terms bridge to
    * DECIMAL(18,4) exactly like t25, so the per-doc sum is order-exact
    * and the served score hash-matches a one-shot recompute.
    *
    * Scale: the doc-side bigram stream shuffle-joins the
    * vocabulary-sized model on (w1, w2)/(w1); the single-row vocab
    * broadcast rides a crossJoin. O(scored docs) + O(model), never
    * O(corpus). */
  def scoreDocs(spark: SparkSession, bigramDir: String, unigramDir: String,
                docs: DataFrame, idCol: String,
                textCol: String): DataFrame = {
    val ws = docs
      .filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(col(idCol), split(col(textCol), " ").as("l"))
      .filter(size(col("l")) >= 2)
    val bg = ws.select(col(idCol),
        explode(zip_with(
          slice(col("l"), lit(1), size(col("l")) - 1),
          slice(col("l"), lit(2), size(col("l")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col(idCol), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val model = read(spark, bigramDir)
      .select(col("w1"), col("w2"), col("n_rows").as("c12"))
    val ctx = model.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val vocab = read(spark, unigramDir).agg(count(lit(1)).as("vocab"))
    bg.join(model, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .crossJoin(broadcast(vocab)) // single row by construction
      .select(col(idCol),
        // 4-dp term bridge — see the t25 gate: 6 dp sits close enough
        // to engine ln() ULP divergence to flip at corpus scale
        round(log((coalesce(col("c12"), lit(0L)) + lit(1)).cast("double") /
          (coalesce(col("c1"), lit(0L)) + col("vocab")).cast("double")), 4)
          .cast("decimal(18,4)").as("lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round((-sum(col("lp"))).cast("double") / count(lit(1)), 6)
          .as("avg_nll"))
  }
}
