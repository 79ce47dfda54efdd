package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sink.{DiFramework, JdbcProcCaller}

/** The REAL JDBC ProcCaller (not the recording stub) driven through a
  * registered fake `java.sql.Driver`: proves the live-SDK seam forms
  * `SELECT schema.proc(?, …)` with BIND placeholders and passes every
  * argument as a parameter — the D6 injection fix observable at the
  * wire level (the reference interpolates f-strings,
  * `di_framework.py:38,66,82,100`). A deployment points the same class
  * at a real Postgres URL; nothing else changes. */
object FakeJdbc {
  val statements =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, Seq[(Int, Any)])]()
  @volatile var response: String =
    """[{"key": "job_id", "value": "7"}, {"key": "status", "value": "success"}]"""
  @volatile var connects = 0

  private def proxy(clazz: Class[_])(
      handler: (String, Array[AnyRef]) => AnyRef): AnyRef =
    java.lang.reflect.Proxy.newProxyInstance(
      clazz.getClassLoader, Array(clazz),
      (_, m, args) =>
        handler(m.getName, if (args == null) Array.empty else args))

  private def resultSet(): java.sql.ResultSet = {
    var rows = 1
    proxy(classOf[java.sql.ResultSet]) {
      case ("next", _) =>
        val has = rows > 0; rows -= 1; java.lang.Boolean.valueOf(has)
      case ("getObject", _) => response
      case ("close", _) => null
      case _ => null
    }.asInstanceOf[java.sql.ResultSet]
  }

  private def prepared(sql: String): java.sql.PreparedStatement = {
    val binds = scala.collection.mutable.ArrayBuffer.empty[(Int, Any)]
    proxy(classOf[java.sql.PreparedStatement]) {
      case ("setObject", args) =>
        binds += ((args(0).asInstanceOf[Integer].intValue(), args(1))); null
      case ("executeQuery", _) =>
        statements.add((sql, binds.toSeq)); resultSet()
      case ("close", _) => null
      case _ => null
    }.asInstanceOf[java.sql.PreparedStatement]
  }

  private def connection(): java.sql.Connection =
    proxy(classOf[java.sql.Connection]) {
      case ("prepareStatement", args) =>
        prepared(args(0).asInstanceOf[String])
      case ("setAutoCommit", _) | ("close", _) => null
      case ("isClosed", _) => java.lang.Boolean.FALSE
      case _ => null
    }.asInstanceOf[java.sql.Connection]

  class Driver extends java.sql.Driver {
    override def acceptsURL(url: String): Boolean =
      url != null && url.startsWith("jdbc:graftfake:")
    override def connect(url: String,
                         info: java.util.Properties): java.sql.Connection =
      if (!acceptsURL(url)) null
      else { connects += 1; connection() }
    override def getPropertyInfo(url: String, info: java.util.Properties) =
      Array.empty[java.sql.DriverPropertyInfo]
    override def getMajorVersion: Int = 1
    override def getMinorVersion: Int = 0
    override def jdbcCompliant(): Boolean = false
    override def getParentLogger: java.util.logging.Logger =
      throw new java.sql.SQLFeatureNotSupportedException()
  }

  lazy val registered: Unit =
    java.sql.DriverManager.registerDriver(new Driver)
}

class JdbcProcCallerSpec extends AnyFunSuite {

  private def fresh(): JdbcProcCaller = {
    FakeJdbc.registered
    FakeJdbc.statements.clear()
    new JdbcProcCaller("jdbc:graftfake:di", new java.util.Properties)
  }

  test("call forms bind-parameter SQL and returns the proc's response") {
    val caller = fresh()
    val resp = caller.call("di.strt_job", Seq("jobA", Integer.valueOf(42)))
    assert(resp === FakeJdbc.response)
    val (sql, binds) = FakeJdbc.statements.peek()
    assert(sql === "SELECT di.strt_job(?, ?)")
    assert(binds === Seq((1, "jobA"), (2, Integer.valueOf(42))))
    caller.close()
  }

  test("hostile arguments stay bind values — never reach the SQL text") {
    val caller = fresh()
    val hostile = "x'); DROP TABLE jobs; --"
    caller.call("di.log_job", Seq(hostile)): Unit
    val (sql, binds) = FakeJdbc.statements.peek()
    assert(sql === "SELECT di.log_job(?)")
    assert(!sql.contains("DROP"))
    assert(binds === Seq((1, hostile)))
    caller.close()
  }

  test("DiFramework job bracket works end-to-end over the JDBC caller") {
    val caller = fresh()
    val di = new DiFramework(caller, "di", "graft_job")
    assert(di.startJob() === Some("7"))
    val calls = FakeJdbc.statements.iterator()
    val (sql, binds) = calls.next()
    assert(sql === "SELECT di.strt_job(?)")
    assert(binds === Seq((1, "graft_job")))
    // one connection for the whole bracket (autocommit per reference)
    assert(FakeJdbc.connects >= 1)
    caller.close()
  }
}
