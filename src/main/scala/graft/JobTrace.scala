package graft

import org.apache.spark.sql.SparkSession

/** Measurement tooling (optimization rounds): run one gate query and print
  * every Spark job it submits — id, duration, and the call site — so a
  * 30-job gate's cost can be attributed sub-step by sub-step (under AQE
  * each exchange materialization is its own job, so the job list IS the
  * sequential-stage story the bench floor multiplies).
  *
  *   runMain graft.JobTrace <sfDir> <q1,q2,...>
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: JobTrace <sfDir> <q1,q2,...>")
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val unknown = names.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.locality.wait", "0")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val p = Option(e.properties)
        val desc = p.flatMap(x => Option(x.getProperty("spark.job.description")))
          .orElse(p.flatMap(x => Option(x.getProperty("callSite.short"))))
        val stageNames = e.stageInfos.map(si =>
          si.name.take(60) + s"[${si.numTasks}t]").mkString(" | ")
        val site = desc.map(_.take(60) + " :: ").getOrElse("") + stageNames
        jobs.put(e.jobId, (e.time, site, e.stageInfos.size)): Unit
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach { case (t0, site, nStages) =>
          done.add(f"  job=${e.jobId}%4d ${(e.time - t0) / 1000.0}%7.3fs stages=$nStages%2d  $site"): Unit
        }
      }
    }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm run (artifact/memos build) so the traced run matches what the
      // bench's min-of-N actually times
      fn(spark, sfDir).count(): Unit
      graft.queries.Memos.evictQueryMemos(spark)
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count(): Unit
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      spark.sparkContext.removeSparkListener(listener)
      println(f"JOBTRACE $name total=$dt%.3fs jobs=${done.size}")
      done.forEach(l => println(l))
      done.clear(); jobs.clear()
    }
    spark.stop()
  }
}
