package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{History, LakeCatalog}

/** Randomized end-to-end check of the partition-decidable metadata
  * aggregates ([[graft.sources.PartitionPredicate]]): against a lake
  * whose partition values exercise Hive escaping (%, :, =, space), a
  * null partition, and a numeric partition column, every random
  * predicate's `COUNT(*)` through the catalog must equal the same SQL
  * over the raw parquet directory — whether the answer came from
  * metadata (LocalTableScan) or the fallback scan. The test also
  * asserts a healthy fraction WAS metadata-answered, so the property
  * is not vacuously green via permanent fallback. */
class PartitionPredicateFuzzSpec extends AnyFunSuite {
  lazy val spark = {
    val s = SparkTestBase.spark
    s.conf.set("spark.sql.catalog.lake", classOf[LakeCatalog].getName)
    s
  }

  private val langs =
    Seq("en", "de-AT", "pct%40", "co:lon", "eq=ls", null)
  private val days = Seq(1L, 5L, 10L, 42L)

  private def mkLake(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ppfuzz").toString + "/lake"
    val rows = for {
      (l, li) <- langs.zipWithIndex
      d <- days
      i <- 0 until (li + 1) // distinct counts per partition
    } yield (li.toLong * 1000 + d * 10 + i, l, d, (i + 1) * 7L)
    rows.toDF("id", "lang", "day", "n_chars")
      .repartition(col("lang"), col("day"))
      .write.partitionBy("lang", "day").parquet(dir)
    History.enableManifests(spark, dir): Unit
    History.refreshRowCounts(spark, dir): Unit
    dir
  }

  private def lit(s: String): String = s"'${s.replace("'", "''")}'"

  /** Random predicate over (lang, day[, n_chars]) from a small
    * grammar; `dataCol` mixes in a data column (forcing fallback). */
  private def predicate(r: scala.util.Random): String = {
    def langAtom(): String = r.nextInt(6) match {
      case 0 => s"lang = ${lit(langs(r.nextInt(5)))}"
      case 1 => s"lang != ${lit(langs(r.nextInt(5)))}"
      case 2 =>
        val vs = Seq.fill(1 + r.nextInt(3))(langs(r.nextInt(5)))
        s"lang IN (${vs.map(lit).mkString(", ")})"
      case 3 => "lang IS NULL"
      case 4 => "lang IS NOT NULL"
      case _ => s"lang LIKE ${lit(langs(r.nextInt(5)).take(2) + "%")}"
    }
    def dayAtom(): String = {
      val k = days(r.nextInt(days.length)) + r.nextInt(3) - 1
      r.nextInt(4) match {
        case 0 => s"day = $k"
        case 1 => s"day < $k"
        case 2 => s"day >= $k"
        case _ => s"day BETWEEN ${k - 4} AND $k"
      }
    }
    def dataAtom(): String = s"n_chars >= ${7 * (1 + r.nextInt(3))}"
    def atom(): String = r.nextInt(10) match {
      case n if n < 4 => langAtom()
      case n if n < 8 => dayAtom()
      case 8 => dataAtom()
      case _ => s"NOT (${langAtom()})"
    }
    (1 to (1 + r.nextInt(2)))
      .map(_ => atom())
      .mkString(if (r.nextBoolean()) " AND " else " OR ")
  }

  test("random partition predicates: metadata count == scan count") {
    val dir = mkLake()
    var metaAnswered = 0
    var total = 0
    for (seed <- Seq(11, 23, 47); _ <- 1 to 25) {
      val r = new scala.util.Random(seed * 1000 + total)
      val where = predicate(r)
      total += 1
      val viaLake = spark.sql(
        s"SELECT COUNT(*) AS n FROM lake.`$dir` WHERE $where")
      val got = viaLake.collect().head.getLong(0)
      val want = spark.sql(
        s"SELECT COUNT(*) AS n FROM parquet.`$dir` WHERE $where")
        .collect().head.getLong(0)
      assert(got === want,
        s"metadata/scan count mismatch for WHERE $where")
      if (viaLake.queryExecution.executedPlan.toString
          .contains("LocalTableScan")) metaAnswered += 1
    }
    // the property must not be green by permanent fallback
    assert(metaAnswered >= total / 4,
      s"only $metaAnswered/$total predicates metadata-answered")
  }

  test("random grouped counts: metadata groups == scan groups") {
    val dir = mkLake()
    var metaAnswered = 0
    for (seed <- Seq(5, 19); i <- 1 to 10) {
      val r = new scala.util.Random(seed * 100 + i)
      val where = predicate(r)
      val gcol = if (r.nextBoolean()) "lang" else "day"
      def rows(src: String) = spark.sql(
        s"SELECT $gcol AS g, COUNT(*) AS n FROM $src WHERE $where " +
          s"GROUP BY $gcol")
      val viaLake = rows(s"lake.`$dir`")
      val got = viaLake.collect()
        .map(x => (Option(x.get(0)).map(_.toString), x.getLong(1))).toSet
      val want = rows(s"parquet.`$dir`").collect()
        .map(x => (Option(x.get(0)).map(_.toString), x.getLong(1))).toSet
      assert(got === want,
        s"grouped mismatch for WHERE $where GROUP BY $gcol")
      if (viaLake.queryExecution.executedPlan.toString
          .contains("LocalTableScan")) metaAnswered += 1
    }
    assert(metaAnswered >= 3, s"only $metaAnswered grouped metadata answers")
  }
}
