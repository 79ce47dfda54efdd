package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.History

/** Lake schema evolution: a record column added mid-life must survive
  * every read AND — critically — every compaction rewrite. The default
  * single-footer parquet inference silently omits late columns; a
  * compaction reading that way would DROP the column from rewritten
  * rows (data loss), which is why compactLatest merges footers. */
class SchemaEvolutionSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def seedEvolvedLake(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve").toString
    // era 1: (siteId, ts) — before the schema gained `quality`
    Seq(("ROZ", "2019-10-03", "2087", 100L), ("ROZ", "2019-10-03", "8", 100L))
      .toDF("region", "dt", "siteId", "ts")
      .write.partitionBy("region", "dt").mode("append").parquet(dir)
    // era 2: same partition grows a `quality` column (newer ts for 2087),
    // plus a fresh partition written entirely post-evolution
    Seq(("ROZ", "2019-10-03", "2087", 200L, 0.9),
        ("ROZ", "2019-10-04", "2087", 300L, 0.7))
      .toDF("region", "dt", "siteId", "ts", "quality")
      .write.partitionBy("region", "dt").mode("append").parquet(dir)
    dir
  }

  test("readEvolved surfaces late columns; plain read may miss them") {
    val dir = seedEvolvedLake()
    val ev = History.readEvolved(spark, dir)
    assert(ev.columns.toSet ===
      Set("region", "dt", "siteId", "ts", "quality"))
    // era-1 rows are null-filled, era-2 rows carry their values
    val q = ev.select("siteId", "ts", "quality").collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
    assert(q === Set(("2087", 100L, None), ("8", 100L, None),
      ("2087", 200L, Some(0.9)), ("2087", 300L, Some(0.7))))
  }

  test("compaction preserves a column added mid-life (no rewrite loss)") {
    val dir = seedEvolvedLake()
    // compact the MIXED-schema partition: latest-wins on (siteId)
    History.compactLatest(spark, dir, Seq("siteId"), "ts",
      col("dt") === "2019-10-03")
    val after = History.readEvolved(spark, dir)
    assert(after.columns.toSet ===
      Set("region", "dt", "siteId", "ts", "quality"),
      "compaction rewrite lost a late-added column")
    val rows = after // partition inference types dt as DATE; compare as string
      .select(col("dt").cast("string"), col("siteId"), col("ts"),
        col("quality")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet
    // 2087 kept its NEWEST era-2 record with quality intact; site 8's
    // era-1 record survives null-filled; day 2 untouched
    assert(rows === Set(
      ("2019-10-03", "2087", 200L, Some(0.9)),
      ("2019-10-03", "8", 100L, None),
      ("2019-10-04", "2087", 300L, Some(0.7))), rows.mkString(";"))
    // the compacted partition now has ONE unified-schema file set: a
    // plain (non-merged) read of that partition sees the full schema
    val plain = spark.read.parquet(s"$dir/region=ROZ/dt=2019-10-03")
    assert(plain.columns.toSet === Set("siteId", "ts", "quality"))
  }
}
