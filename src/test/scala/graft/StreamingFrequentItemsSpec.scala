package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.stream.StreamingFrequentItems

/** Streaming Misra-Gries state: the per-key summary persists across
  * micro-batches, stays bounded at k counters, and keeps a genuinely
  * hot item visible while cold noise churns through. */
class StreamingFrequentItemsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("hot item survives cold churn across micro-batches; state bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(String, String)]
      val hot = StreamingFrequentItems.run(
        input.toDF().toDF("series", "item"), "series", "item", k = 8)
      val q = hot.toDF().writeStream.outputMode("update")
        .format("memory").queryName("hot_items").start()
      try {
        // batch 1: "hh" 30x + 60 cold singletons on series A; series B quiet
        val rnd = new scala.util.Random(11)
        val b1 = rnd.shuffle(Seq.fill(30)("hh") ++
          (0 until 60).map(i => s"cold$i")).map(("A", _)) :+ (("B", "x"))
        input.addData(b1: _*)
        q.processAllAvailable()
        def latest = spark.table("hot_items").collect()
          .map(r => (r.getString(0),
            r.getSeq[String](1), r.getLong(2)))
          .groupBy(_._1).map { case (k, v) => k -> v.maxBy(_._3) }
        val after1 = latest
        assert(after1("A")._2.contains("hh"), after1("A")._2.mkString(","))
        assert(after1("A")._2.size <= 8)
        assert(after1("A")._3 === 90L)
        assert(after1("B")._2 === Seq("x"))
        // batch 2: more cold churn, hh keeps its lead — state persisted
        val b2 = rnd.shuffle(Seq.fill(20)("hh") ++
          (0 until 40).map(i => s"late$i")).map(("A", _))
        input.addData(b2: _*)
        q.processAllAvailable()
        val after2 = latest
        assert(after2("A")._2.contains("hh"), after2("A")._2.mkString(","))
        assert(after2("A")._2.size <= 8)
        assert(after2("A")._3 === 150L) // processed count carried across
      } finally q.stop()
    } finally saved match {
      case Some(v) => spark.conf
        .set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf
        .unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("null items occupy no counter slot and don't inflate processed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(String, Option[String])]
      val hot = StreamingFrequentItems.run(
        input.toDF().toDF("series", "item"), "series", "item", k = 4)
      val q = hot.toDF().writeStream.outputMode("update")
        .format("memory").queryName("hot_items_nulls").start()
      try {
        input.addData(("A", Some("x")), ("A", None), ("A", Some("x")),
          ("A", None), ("A", Some("y")))
        q.processAllAvailable()
        val r = spark.table("hot_items_nulls").collect()
          .map(row => (row.getString(0), row.getSeq[String](1),
            row.getLong(2))).head
        assert(!r._2.contains(null), r._2.mkString(","))
        assert(r._2.toSet === Set("x", "y"))
        assert(r._3 === 3L) // nulls excluded from the processed total
      } finally q.stop()
    } finally saved match {
      case Some(v) => spark.conf
        .set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf
        .unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
