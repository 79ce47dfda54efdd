package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.fixtures.ReferenceFixtures._

/** The SQL-first surface: representative gates from every query family
  * (x/e/t/s/q) re-expressed as PURE SQL text over [[Views]]' registered
  * temp views must reproduce the DataFrame pipelines hash-exactly — a
  * SQL-only user gets the same engine, same results. */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  /** Column-order- and row-order-insensitive canonical image (the same
    * normalization the driver's oracle compare applies: sort columns by
    * name, then rows by value). */
  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted
  }

  private val sqlGates: Map[String, String] = Map(
    // x-family: flagship detector-count pipeline over the canonical views
    "x01_detector_counts" ->
      """SELECT collectionIntervalSecs, region, siteId,
        |       collectionendtimestamp_plus_3_mins, did, cnt
        |FROM detector_records
        |LATERAL VIEW explode(detectorCounts) t AS did, cnt""".stripMargin,

    // q-family: TPC-H Q1 with the exact decimal-bridge arithmetic
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |    AS DECIMAL(24,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
        |    AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(1)
        |    AS avg_disc,
        |  count(1) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= '2001-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    // t-family: TF-IDF top-3 terms per document
    "t06_tfidf_terms" ->
      """WITH words AS (
        |  SELECT doc_id, explode(split(text, ' ')) AS word FROM documents
        |), tf AS (
        |  SELECT doc_id, word, count(1) AS tf FROM words
        |  GROUP BY doc_id, word
        |), dfreq AS (
        |  SELECT word, count(1) AS df FROM tf GROUP BY word
        |), n AS (
        |  SELECT count(1) AS n_docs FROM documents
        |), scored AS (
        |  SELECT doc_id, word,
        |         round(tf * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)),
        |               6) AS tfidf
        |  FROM tf JOIN dfreq USING (word) CROSS JOIN n
        |), ranked AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY tfidf DESC, word ASC) AS rank
        |  FROM scored
        |)
        |SELECT doc_id, word, rank, tfidf FROM ranked WHERE rank <= 3"""
        .stripMargin,

    // s-family: brute-force cosine top-5 via the SQL-registered
    // dot_product codegen expression
    "s01_cosine_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS q_emb,
        |         sqrt(dot_product(embedding, embedding)) AS q_nrm
        |  FROM embeddings WHERE vec_id % 50 = 0
        |), c AS (
        |  SELECT vec_id AS b_id, embedding AS b_emb,
        |         sqrt(dot_product(embedding, embedding)) AS b_nrm
        |  FROM embeddings
        |), scored AS (
        |  SELECT query_id, b_id,
        |         round(dot_product(q_emb, b_emb) / (q_nrm * b_nrm), 6)
        |           AS cos_r
        |  FROM c JOIN q ON query_id != b_id
        |), ranked AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cos_r DESC, b_id ASC) AS rank
        |  FROM scored
        |)
        |SELECT query_id, b_id, rank, cos_r FROM ranked WHERE rank <= 5"""
        .stripMargin,

    // e-family: the as-of join's MERGE pattern as window SQL
    "e06_asof_join" ->
      """WITH clicks AS (
        |  SELECT user_id, ts, event_id FROM events
        |  WHERE event_type = 'click'
        |), views_ AS (
        |  SELECT user_id, ts, event_id FROM events
        |  WHERE event_type = 'view'
        |), u AS (
        |  SELECT user_id, ts, event_id,
        |         CAST(NULL AS STRUCT<event_id: BIGINT, ts: BIGINT>) AS _asof,
        |         1 AS _side
        |  FROM clicks
        |  UNION ALL
        |  SELECT user_id, ts, CAST(NULL AS BIGINT) AS event_id,
        |         named_struct('event_id', event_id, 'ts', ts) AS _asof,
        |         0 AS _side
        |  FROM views_
        |), carried AS (
        |  SELECT user_id, ts, event_id, _side,
        |         last(_asof, true) OVER (
        |           PARTITION BY user_id ORDER BY ts ASC, _side ASC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _asof
        |  FROM u
        |)
        |SELECT user_id, event_id AS l_event_id, _asof.event_id AS r_event_id,
        |       (ts div 1000) - (_asof.ts div 1000) AS delta_us
        |FROM carried
        |WHERE _side = 1 AND _asof.event_id IS NOT NULL""".stripMargin
  )

  test("pure-SQL gates reproduce the DataFrame pipelines hash-exactly") {
    import spark.implicits._
    Views.register(spark, dir)
    Views.registerCanonical(spark, Seq(streamPayload).toDF("value"),
      Seq(topologyDoc).toDF("fragment"))
    sqlGates.foreach { case (name, sql) =>
      val viaSql = canon(spark.sql(sql))
      val viaDf = canon(SparkEntry.queries(name)(spark, dir))
      assert(viaSql.nonEmpty, s"$name: SQL produced no rows")
      assert(viaSql === viaDf, s"$name: SQL != DataFrame result")
    }
  }

  test("bottom_k is SQL-callable and matches the KMV sketch operator") {
    Views.register(spark, dir)
    // per-source bottom-4 of the 48-bit word hashes, via pure SQL
    val viaSql = spark.sql(
      """SELECT source,
        |  bottom_k(CAST(conv(substring(md5(word), 1, 12), 16, 10) AS BIGINT), 4) AS hs
        |FROM (SELECT source, explode(split(text, ' ')) AS word FROM documents)
        |GROUP BY source""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val viaOp = graft.ext.KMV.sketch(
      spark.table("documents")
        .selectExpr("source", "explode(split(text, ' ')) AS word"),
      "source", "word", 4)
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq).toMap
    assert(viaSql === viaOp)
    assert(viaSql.values.forall(_.length == 4))
  }

  test("top_k_scored is SQL-callable and matches the Column surface") {
    Views.register(spark, dir)
    // per-source top-3 docs by doc_id score, via pure SQL
    val viaSql = spark.sql(
      """SELECT source,
        |  transform(top_k_scored(doc_id, CAST(doc_id AS DOUBLE), 3),
        |            x -> x.id) AS ids
        |FROM documents GROUP BY source""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val viaOp = spark.table("documents")
      .groupBy(org.apache.spark.sql.functions.col("source"))
      .agg(graft.functions.TopKScored.top_k_scored(
        org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("doc_id").cast("double"), 3)
        .as("top"))
      .selectExpr("source", "transform(top, x -> x.id) AS ids")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(viaSql === viaOp)
    assert(viaSql.values.forall(_.length == 3))
  }

  test("both SQL registration surfaces expose the same function set") {
    // Surface 1: the builder-time extensions path, driven through the
    // exact injection mechanism `spark.sql.extensions` runs (applied to
    // a fresh child session's registry via the bridge — getOrCreate
    // reuses the JVM-wide session, so a real builder install can't be
    // exercised in-process).
    val viaExtensions = spark.newSession()
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(exts)
    org.apache.spark.sql.graftbridge.ExtensionsBridge.applyFunctions(
      exts, viaExtensions.sessionState.functionRegistry)
    // Surface 2: the existing-session path.
    val viaRegister = spark.newSession()
    Views.registerSqlFunctions(viaRegister)
    val names = graft.functions.GraftFunctions.names
    assert(names.distinct === names) // no duplicate registrations
    for (n <- names; s <- Seq(viaExtensions, viaRegister))
      assert(s.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(n)),
        s"function $n missing from a registration surface")
    // and both actually evaluate the same expression tree: one smoke
    // query per session through a function from each family
    for (s <- Seq(viaExtensions, viaRegister)) {
      val r = s.sql(
        """SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
          |  cms_estimate(cms, xxhash64('a')) AS est
          |FROM (SELECT cms_build(xxhash64(c), 3, 64) AS cms
          |      FROM VALUES ('a'), ('a'), ('b') AS t(c))""".stripMargin)
        .collect().head
      assert(r.getDouble(0) === 11.0)
      assert(r.getLong(1) === 2L)
    }
  }

  test("registerLake exposes the history lake to pure SQL (snapshot read)") {
    import spark.implicits._
    val lake = java.nio.file.Files.createTempDirectory("graft-sql-lake")
      .toString
    graft.sources.History.writePartitioned(
      graft.stream.Pipeline.payloadToRecords(
        Seq(streamPayload).toDF("value")), lake)
    Views.registerLake(spark, lake)
    val bySite = spark.sql(
      """SELECT siteId, count(1) AS n, sum(CAST(size(detectorCounts) AS BIGINT)) AS n_det
        |FROM history GROUP BY siteId ORDER BY siteId""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(bySite.toSet === Set(("2087", 2L, 6L), ("8", 1L, 1L)))
  }
}
