package graft.io

import java.sql.{Connection, Driver, DriverManager, DriverPropertyInfo,
  SQLFeatureNotSupportedException}
import java.util.Properties
import java.lang.reflect.{InvocationHandler, InvocationTargetException, Method,
  Proxy}

/** Cross-JVM shim for the embedded Derby the JDBC gates run against.
  *
  * Embedded Derby is single-booter: the JVM that boots a database holds its
  * `db.lck` until that database is shut down IN THAT JVM. Spark's JDBC read
  * and write paths open connections from BOTH the driver (DDL, schema probe)
  * and the executors (row batches) — so on a multi-JVM master
  * (`local-cluster`, a real cluster) the second JVM's boot fails even though
  * every phase is sequential. A real deployment points these adapters at a
  * database SERVER (PostgreSQL — `postgres_loader.py`); this shim exists so
  * the same adapter code path can be exercised end-to-end across real
  * executor processes with the only JDBC engine available offline.
  *
  * Mechanism: `jdbc:graftderby:<path>` delegates to `jdbc:derby:<path>` and
  * SHUTS THE DATABASE DOWN when each connection closes, releasing the file
  * lock before the next JVM's phase begins. Spark's JDBC phases are strictly
  * hand-over-hand (driver DDL -> executor inserts -> driver schema probe ->
  * executor scan), so shutdown-on-close gives correct cross-JVM
  * serialization. Callers must keep row traffic single-partition
  * (`numPartitions=1`) so batches never hold the lock concurrently from two
  * executors; the gate's dimension-table roundtrip does.
  */
class DerbySingleJvmDriver extends Driver {
  import DerbySingleJvmDriver._

  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith(Prefix)

  override def connect(url: String, info: Properties): Connection = {
    if (!acceptsURL(url)) return null
    val real = "jdbc:derby:" + url.stripPrefix(Prefix)
    // boot attributes (;create=true etc.) are connect-time only; the
    // shutdown URL is the bare database path
    val dbBase = real.split(';').head
    // Derby 10.15+ registers the embedded driver via ServiceLoader; touch
    // the class so an executor that has never seen Derby loads it
    Class.forName("org.apache.derby.iapi.jdbc.AutoloadedDriver")
    val delegate = DriverManager.getConnection(real, info)
    Proxy.newProxyInstance(
      getClass.getClassLoader,
      Array(classOf[Connection]),
      new ShutdownOnClose(delegate, dbBase)
    ).asInstanceOf[Connection]
  }

  override def getPropertyInfo(url: String, info: Properties):
      Array[DriverPropertyInfo] = Array.empty
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = true
  override def getParentLogger: java.util.logging.Logger =
    throw new SQLFeatureNotSupportedException()
}

object DerbySingleJvmDriver {
  val Prefix = "jdbc:graftderby:"

  /** Spark resolves its JdbcDialect by URL prefix, so the shim scheme needs
    * its own registration — Derby-correct DDL types (the default dialect's
    * `TEXT` does not exist in Derby). Registration is idempotent via lazy
    * val; gates touch [[ensureDialect]] before first use. */
  private object GraftDerbyDialect
      extends org.apache.spark.sql.jdbc.JdbcDialect {
    override def canHandle(url: String): Boolean = url.startsWith(Prefix)
    override def getJDBCType(dt: org.apache.spark.sql.types.DataType):
        Option[org.apache.spark.sql.jdbc.JdbcType] = {
      import org.apache.spark.sql.jdbc.JdbcType
      import org.apache.spark.sql.types._
      dt match {
        case StringType  => Some(JdbcType("VARCHAR(32672)", java.sql.Types.VARCHAR))
        case BooleanType => Some(JdbcType("BOOLEAN", java.sql.Types.BOOLEAN))
        case ShortType | ByteType =>
          Some(JdbcType("SMALLINT", java.sql.Types.SMALLINT))
        case BinaryType  => Some(JdbcType("BLOB", java.sql.Types.BLOB))
        case _ => None // numeric/date defaults are Derby-valid
      }
    }
  }

  lazy val ensureDialect: Unit =
    org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(GraftDerbyDialect)

  /** Delegates every Connection call; on close, additionally shuts the
    * database down so the lock leaves this JVM. A successful Derby shutdown
    * REPORTS as SQLException 08006 — expected, swallowed. */
  private final class ShutdownOnClose(delegate: Connection, dbBase: String)
      extends InvocationHandler {
    override def invoke(proxy: AnyRef, m: Method, args: Array[AnyRef]):
        AnyRef = {
      val out =
        try m.invoke(delegate, args: _*)
        catch { case e: InvocationTargetException => throw e.getCause }
      if (m.getName == "close") {
        try DriverManager.getConnection(dbBase + ";shutdown=true")
        catch { case _: java.sql.SQLException => () } // 08006 = success
      }
      out
    }
  }
}
