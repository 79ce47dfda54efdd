package graft

import org.apache.spark.sql.SparkSession

/** Measurement tooling (optimization rounds): dump `explain("formatted")`
  * for the named gate queries into files — the before/after plan evidence
  * committed under `plans/rNN/`. Usage:
  *
  *   runMain graft.PlanDump <sfDir> <outDir> <suffix> [q1,q2,...]
  *
  * With no query list, dumps every gate. File name: `<query>_<suffix>.txt`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <sfDir> <outDir> <suffix> [q1,q2,...]")
    val (sfDir, outDir, suffix) = (args(0), args(1), args(2))
    val names = if (args.length > 3)
      args(3).split(",").map(_.trim).filter(_.nonEmpty).toSet
    else SparkEntry.queries.keySet
    val unknown = names -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    SparkEntry.queries.filter(kv => names(kv._1)).toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        val txt = try {
          val df = fn(spark, sfDir)
          // same API as .explain("formatted"), captured instead of printed
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        } catch { case e: Exception =>
          s"ERROR building plan: ${e.getMessage}"
        }
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
        println(s"PLANDUMP $name -> $outDir/${name}_$suffix.txt")
      }
    spark.stop()
  }
}
