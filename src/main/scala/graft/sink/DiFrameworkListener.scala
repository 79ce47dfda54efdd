package graft.sink

import org.apache.spark.sql.streaming.StreamingQueryListener

/** D4 wiring (SURVEY.md §2.10): the reference defines `error_job`
  * (status_cd = -1) but never calls it from `main`
  * (`di_framework.py:88-104`); the Spark-native home for the error
  * terminal state is `onQueryTerminated` — any streaming query that dies
  * with an exception closes its audit job as errored.
  *
  * Register with `spark.streams.addListener(new DiFrameworkListener(di))`.
  */
class DiFrameworkListener(di: DiFramework) extends StreamingQueryListener {
  override def onQueryStarted(
      event: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryProgress(
      event: StreamingQueryListener.QueryProgressEvent): Unit = ()
  override def onQueryTerminated(
      event: StreamingQueryListener.QueryTerminatedEvent): Unit =
    event.exception.foreach { msg => di.errorJob(msg) }
}
