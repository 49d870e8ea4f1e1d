package graft

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.net.{ServerSocket, Socket}
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

/** r11 verdict #6: `foreachPartitionJdbc` was proven only against
  * in-JVM embedded Derby — no bytes ever crossed a socket, so the
  * batching/connect-retry claims had no network evidence (and the
  * environment ships no Derby network server or external DB). This
  * spec closes that gap with a REAL TCP path: a line-protocol server
  * on an ephemeral port plus a minimal `java.sql.Driver` registered
  * with DriverManager that speaks it. The driver implements exactly
  * the JDBC surface the sink touches (connect handshake,
  * prepareStatement, setObject/addBatch/executeBatch, commit, close)
  * via a reflective proxy — a test double, not a database — so what is
  * being tested is the SINK's lifecycle over a socket: per-partition
  * connections, ≤batchSize batches, commit-per-flush, and
  * exponential-backoff retry when the server refuses the first
  * connects (a node restarting behind a load balancer — the routine
  * transient on a 1000-executor write).
  */
object LineProtocolJdbc {

  /** Test server: handshakes "HELLO", then accepts
    * `BATCH n` + n tab-joined rows (reply "OK"), `COMMIT` (reply
    * "OK"), `CLOSE`. The first `refusals` accepted sockets are closed
    * BEFORE the handshake — the client sees a dead connection at
    * connect time, which must surface as a retryable SQLException.
    */
  final class Server(refusals: Int) {
    val rows = new ConcurrentLinkedQueue[String]
    val batchSizes = new ConcurrentLinkedQueue[Integer]
    val commits = new AtomicInteger
    val connections = new AtomicInteger
    private val refuse = new AtomicInteger(refusals)
    private val server = new ServerSocket(0)
    def port: Int = server.getLocalPort
    @volatile private var running = true

    private val acceptor = new Thread(() => {
      while (running) {
        try {
          val s = server.accept()
          if (refuse.getAndDecrement() > 0) s.close()
          else {
            connections.incrementAndGet()
            val t = new Thread(() => handle(s))
            t.setDaemon(true)
            t.start()
          }
        } catch { case _: Throwable => () }
      }
    })
    acceptor.setDaemon(true)
    acceptor.start()

    private def handle(s: Socket): Unit = {
      val in = new BufferedReader(new InputStreamReader(s.getInputStream))
      val out = new PrintWriter(s.getOutputStream, true)
      out.println("HELLO")
      var line = in.readLine()
      while (line != null && line != "CLOSE") {
        if (line.startsWith("BATCH ")) {
          val n = line.stripPrefix("BATCH ").toInt
          batchSizes.add(n)
          var i = 0
          while (i < n) { rows.add(in.readLine()); i += 1 }
          out.println("OK")
        } else if (line == "COMMIT") {
          commits.incrementAndGet()
          out.println("OK")
        }
        line = in.readLine()
      }
      s.close()
    }

    def stop(): Unit = { running = false; server.close() }
  }

  /** The minimal driver. URL shape: jdbc:graftline://localhost:PORT */
  final class LineDriver extends java.sql.Driver {
    override def acceptsURL(url: String): Boolean = url.startsWith("jdbc:graftline://")
    override def connect(url: String, info: java.util.Properties): java.sql.Connection = {
      if (!acceptsURL(url)) return null // JDBC contract: not ours → null
      val hp = url.stripPrefix("jdbc:graftline://").stripSuffix("/").split(":")
      val sock = new Socket(hp(0), hp(1).toInt)
      val in = new BufferedReader(new InputStreamReader(sock.getInputStream))
      val out = new PrintWriter(sock.getOutputStream, true)
      val hello = in.readLine()
      if (hello != "HELLO") {
        sock.close()
        throw new java.sql.SQLException(s"graftline server refused the connection (got: $hello)")
      }
      connectionProxy(sock, in, out)
    }
    override def getMajorVersion: Int = 1
    override def getMinorVersion: Int = 0
    override def getPropertyInfo(u: String, p: java.util.Properties): Array[java.sql.DriverPropertyInfo] =
      Array.empty
    override def jdbcCompliant(): Boolean = false
    override def getParentLogger: java.util.logging.Logger =
      throw new java.sql.SQLFeatureNotSupportedException
  }

  private def expectOk(in: BufferedReader, what: String): Unit = {
    val r = in.readLine()
    if (r != "OK") throw new java.sql.SQLException(s"$what not acknowledged: $r")
  }

  /** Default result for proxy methods outside the exercised surface —
    * primitives need a real value, everything else may be null.
    */
  private def defaultFor(m: Method): AnyRef = m.getReturnType match {
    case java.lang.Boolean.TYPE => java.lang.Boolean.FALSE
    case java.lang.Integer.TYPE => Integer.valueOf(0)
    case java.lang.Long.TYPE    => java.lang.Long.valueOf(0L)
    case _                      => null
  }

  private def connectionProxy(sock: Socket, in: BufferedReader, out: PrintWriter): java.sql.Connection =
    Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[java.sql.Connection]),
      new InvocationHandler {
        override def invoke(proxy: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "prepareStatement" => statementProxy(in, out)
          case "setAutoCommit"    => null
          case "commit"           => out.println("COMMIT"); expectOk(in, "COMMIT"); null
          case "close"            => out.println("CLOSE"); sock.close(); null
          case "isClosed"         => java.lang.Boolean.valueOf(sock.isClosed)
          case "toString"         => s"LineConnection(${sock.getPort})"
          case "hashCode"         => Integer.valueOf(System.identityHashCode(proxy))
          case "equals"           => java.lang.Boolean.valueOf(proxy.asInstanceOf[AnyRef] eq args(0))
          case _                  => defaultFor(m)
        }
      }).asInstanceOf[java.sql.Connection]

  private def statementProxy(in: BufferedReader, out: PrintWriter): java.sql.PreparedStatement = {
    val params = scala.collection.mutable.TreeMap.empty[Int, AnyRef]
    val batch = scala.collection.mutable.ArrayBuffer.empty[String]
    Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[java.sql.PreparedStatement]),
      new InvocationHandler {
        override def invoke(proxy: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "setObject" =>
            params(args(0).asInstanceOf[Integer].intValue) = args(1); null
          case "addBatch" =>
            batch += params.values.map(String.valueOf).mkString("\t"); params.clear(); null
          case "executeBatch" =>
            out.println(s"BATCH ${batch.size}")
            batch.foreach(out.println)
            expectOk(in, "BATCH")
            val r = Array.fill(batch.size)(1)
            batch.clear()
            r
          case "close"    => null
          case "toString" => "LineStatement"
          case "hashCode" => Integer.valueOf(System.identityHashCode(proxy))
          case "equals"   => java.lang.Boolean.valueOf(proxy.asInstanceOf[AnyRef] eq args(0))
          case _          => defaultFor(m)
        }
      }).asInstanceOf[java.sql.PreparedStatement]
  }

  // register once per JVM; DriverManager routes by acceptsURL so the
  // embedded Derby driver and this one never shadow each other
  lazy val register: Unit = DriverManager_register()
  private def DriverManager_register(): Unit =
    java.sql.DriverManager.registerDriver(new LineDriver)
}

class SocketJdbcSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("foreachPartitionJdbc over a real socket: per-partition connections, ≤batchSize batches, commit-per-flush, connect retry") {
    import spark.implicits._
    LineProtocolJdbc.register
    // 2 refusals: the first two connect attempts die before handshake —
    // the sink's exponential-backoff connect retry must absorb them
    // without Spark task retries (which would re-send rows)
    val server = new LineProtocolJdbc.Server(refusals = 2)
    try {
      val nRows = 1000
      val nParts = 4
      val df = (1 to nRows).map(i => (i.toLong, s"w$i")).toDF("id", "word").repartition(nParts)
      graft.sinks.Sinks.foreachPartitionJdbc(df,
        s"jdbc:graftline://localhost:${server.port}",
        "INSERT INTO sink_rows VALUES (?, ?)", batchSize = 128, connectRetries = 5)
      // every row arrived exactly once, over the wire
      import scala.jdk.CollectionConverters._
      val got = server.rows.asScala.toVector
      assert(got.size == nRows, s"expected $nRows rows over the socket, got ${got.size}")
      val ids = got.map(_.split("\t")(0).toLong)
      assert(ids.distinct.size == nRows, "a row was re-sent or lost (retry must not double-insert)")
      assert(got.forall { r => val f = r.split("\t"); f(1) == s"w${f(0)}" })
      // batching honored: never above batchSize, and the flush points
      // imply at least ceil(rows/partition/128) batches per partition
      val sizes = server.batchSizes.asScala.map(_.intValue).toVector
      assert(sizes.sum == nRows && sizes.forall(_ <= 128),
        s"batch sizes violate the ≤128 contract: $sizes")
      // one successful connection per partition — the refused attempts
      // were retried on a NEW socket, not leaked half-open
      assert(server.connections.get == nParts,
        s"expected $nParts connections, got ${server.connections.get}")
      // commit-per-flush plus the final commit per partition
      assert(server.commits.get >= sizes.count(_ == 128) + nParts - 1,
        s"commits ${server.commits.get} vs full batches ${sizes.count(_ == 128)}")
    } finally server.stop()
  }

  test("connect retry surfaces a hard failure once retries are exhausted (no infinite loop, no silent drop)") {
    import spark.implicits._
    LineProtocolJdbc.register
    val server = new LineProtocolJdbc.Server(refusals = Int.MaxValue)
    try {
      val df = (1 to 10).map(i => (i.toLong, s"w$i")).toDF("id", "word").repartition(1)
      val e = intercept[org.apache.spark.SparkException] {
        graft.sinks.Sinks.foreachPartitionJdbc(df,
          s"jdbc:graftline://localhost:${server.port}",
          "INSERT INTO sink_rows VALUES (?, ?)", batchSize = 4,
          connectRetries = 2, retryBackoffMs = 10L)
      }
      assert(e.getMessage != null)
      assert(server.rows.isEmpty, "no handshaked connection may have received rows")
    } finally server.stop()
  }
}
