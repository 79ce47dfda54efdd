package graft.queries

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Lifecycle manager for the per-session memo caches (shared LSH
  * candidate pairs, near-dup clusters, the typed-history fixture lake,
  * and the parquet relation cache in [[graft.Tables]]).
  *
  * The memos exist so one gate/correctness pass pays each expensive
  * sub-pipeline once (d02/d06/d07 share MinHash+LSH pairs; h01–h05 share
  * the lake build). Without eviction they pin persisted DataFrames and
  * temp directories for the life of the JVM — fine at gate cadence,
  * wrong for a long-lived library session. `install(spark)` hooks
  * application end so everything keyed to that session is unpersisted,
  * deleted, and dereferenced when the session stops.
  */
object Memos {

  /** Unpersist + drop the cross-query DataFrame memos for `spark`
    * (candidate pairs, clusters). Used by Bench before every measured
    * iteration so min-of-N times the real pipeline, not a cache read. */
  def evictQueryMemos(spark: SparkSession): Unit =
    ExtQueries.evict(spark)

  /** Full session teardown: query memos, the x-family input relations,
    * the typed-history temp lake, and the cached parquet relations. */
  def evictAll(spark: SparkSession): Unit = {
    ExtQueries.evict(spark)
    ExtQueries.evictArtifacts(spark)
    XmlQueries.evict(spark)
    HistoryQueries.evict(spark)
    graft.Tables.evict(spark)
  }

  private val installed =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Idempotently register an application-end listener that evicts every
    * memo keyed to `spark`. Called by the memo builders themselves, so
    * any code path that creates a memo also arranges its cleanup. */
  def install(spark: SparkSession): Unit = {
    val key = graft.SessionKey(spark)
    if (installed.add(key)) {
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(end: SparkListenerApplicationEnd): Unit = {
          evictAll(spark)
          installed.remove(key)
        }
      })
    }
  }
}
