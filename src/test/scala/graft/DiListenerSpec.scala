package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.sink.{DiFramework, DiFrameworkListener, ProcCaller}

/** D4: a streaming query dying with an exception closes the audit job as
  * errored via the query listener. */
class DiListenerSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("onQueryTerminated(exception) → error_job(status_cd=-1) call") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val calls = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val caller = new ProcCaller {
      override def call(proc: String, args: Seq[Any]): String = {
        calls.add(s"$proc(${args.mkString(",")})")
        """[{"key": "job_id", "value": "9"}]"""
      }
    }
    val di = new DiFramework(caller, "disch", "graft_job")
    val listener = new DiFrameworkListener(di)
    spark.streams.addListener(listener)
    try {
      val input = MemoryStream[String]
      val q = input.toDF().writeStream
        .foreachBatch { (_: DataFrame, _: Long) =>
          throw new RuntimeException("sink exploded")
        }
        .start()
      input.addData("x")
      intercept[Exception] { q.awaitTermination(30000) }
      // listener fires asynchronously
      val deadline = System.currentTimeMillis() + 10000
      while (calls.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      val errorCalls = calls.toArray.map(_.toString)
        .filter(_.startsWith("disch.end_job"))
      assert(errorCalls.nonEmpty, calls.toArray.mkString(";"))
      assert(errorCalls.head.contains("sink exploded") &&
        errorCalls.head.contains("-1"))
    } finally spark.streams.removeListener(listener)
  }
}
