package graft.ext

import org.apache.spark.sql.SparkSession

/** Session-keyed ledger of RDD-level checkpoints whose handles would
  * otherwise be unreachable for deterministic release (ADVICE r20:
  * `dropOversizedKeys(materialize = true)` discarded its checkpoint
  * handle, so a long-lived driver only reclaimed the executor blocks
  * when the GC happened to collect the frame). Anything registered here
  * is released by the same eviction pass that drops the query memos —
  * Bench between measured iterations, [[graft.queries.Memos]] at
  * session teardown — so repeated invocations on a long-lived session
  * never accumulate storage.
  *
  * Release is idempotent ([[Dedup.releaseBacking]]'s `releaseRdd`
  * contract) and safe against frames still lazily referencing a
  * released checkpoint: a localCheckpoint RDD whose blocks were
  * unpersisted recomputes from lineage only if the lineage was kept —
  * here the entries are released exactly when their consumers (the
  * per-iteration query frames) are dropped too.
  */
object CkptRegistry {

  private val byKey = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.rdd.RDD[_]]]()

  def register(spark: SparkSession, rdd: org.apache.spark.rdd.RDD[_]): Unit = {
    byKey.computeIfAbsent(graft.SessionKey(spark),
      _ => new java.util.concurrent.ConcurrentLinkedQueue[
        org.apache.spark.rdd.RDD[_]]()).add(rdd): Unit
  }

  /** A LAZY local checkpoint of `df`'s rows, registered for release:
    * the first action over the returned frame materializes every
    * partition (Spark's job-end doCheckpoint computes any the action
    * itself skipped), later consumers read the persisted blocks instead
    * of re-running the upstream plan, and concurrent consumers (AQE
    * broadcast-build jobs) dedup at the block level
    * (BlockManager.getOrElseUpdate — one computes, others wait). Use
    * for an expensive intermediate consumed by several branches of one
    * query where Catalyst's exchange reuse cannot fire (the branches
    * differ by more than inferred filters). Lineage-truncating: the
    * returned frame is a LogicalRDD, so per-branch pushdown into the
    * original scan no longer applies — only checkpoint intermediates
    * every branch reads in full. */
  def checkpointed(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val rdd = df.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    register(df.sparkSession, rdd)
    org.apache.spark.sql.graftbridge.DatasetBridge
      .internalDf(df.sparkSession, rdd, df.schema)
  }

  /** Unpersist every checkpoint registered to `spark`'s session key. */
  def release(spark: SparkSession): Unit = {
    val q = byKey.remove(graft.SessionKey(spark))
    if (q != null) {
      val it = q.iterator()
      while (it.hasNext) {
        try org.apache.spark.sql.graftbridge.DatasetBridge.releaseRdd(it.next())
        catch { case _: Throwable => () } // context may already be down
      }
    }
  }
}
