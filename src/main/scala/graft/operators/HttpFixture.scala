package graft.operators

import java.net.InetSocketAddress
import java.nio.file.{Files, Path, Paths}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Loopback HTTP file server for hermetic transport tests — the analogue of
  * the reference's Jetty test fixture (datatools-jetty-test-server/
  * JettyFileServerFixture.java:62,108-136), on the JDK built-in server so no
  * dependency is added. Serves GET/HEAD with `Range: bytes=a-b` support
  * (single range, 206 + Content-Range), binding 127.0.0.1 only: the
  * zero-egress sandbox is never left.
  *
  * One lazily-started server per JVM; `serve` registers a file and returns
  * its URL. Daemon threads — the JVM exits freely.
  */
object HttpFixture {

  private val rangeRe = "bytes=(\\d+)-(\\d+)".r
  private val registry = new java.util.concurrent.ConcurrentHashMap[String, Path]()
  // keys served WITHOUT range support (200 + full body even when a Range
  // header arrives) — exercises the fetcher's skip-to-offset fallback
  private val noRange = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  // monotonic registry keys: hashCode-based keys could collide across two
  // distinct paths with the same filename and silently remap an earlier URL
  private val keySeq = new java.util.concurrent.atomic.AtomicLong(0)
  @volatile private var server: HttpServer = null

  private def ensureStarted(): HttpServer = synchronized {
    if (server == null) {
      val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
      s.createContext("/", (ex: HttpExchange) => handle(ex))
      s.setExecutor(java.util.concurrent.Executors.newCachedThreadPool { r =>
        val t = new Thread(r, "graft-http-fixture")
        t.setDaemon(true)
        t
      })
      // start() spawns the internal HTTP-Dispatcher thread, which inherits
      // daemon-ness from its creator — start from a daemon thread or the
      // dispatcher pins the JVM open after main() returns
      val starter = new Thread(() => s.start(), "graft-http-fixture-start")
      starter.setDaemon(true)
      starter.start()
      starter.join()
      server = s
    }
    server
  }

  private def handle(ex: HttpExchange): Unit = {
    try {
      val key = ex.getRequestURI.getPath.stripPrefix("/")
      val path = registry.get(key)
      if (path == null) {
        ex.sendResponseHeaders(404, -1)
      } else {
        val size = Files.size(path)
        ex.getResponseHeaders.set("Accept-Ranges", "bytes")
        val range =
          if (noRange.contains(key)) None
          else Option(ex.getRequestHeaders.getFirst("Range"))
        (ex.getRequestMethod, range) match {
          case ("HEAD", _) =>
            // HttpServer forbids a body on HEAD: length -1 = no body, so set
            // Content-Length explicitly for the size probe
            ex.getResponseHeaders.set("Content-Length", size.toString)
            ex.sendResponseHeaders(200, -1)
          case (_, Some(rangeRe(a, b))) =>
            val lo = a.toLong
            val hi = math.min(b.toLong, size - 1)
            if (lo > hi || lo >= size) {
              ex.sendResponseHeaders(416, -1)
            } else {
              val len = (hi - lo + 1).toInt
              val ch = java.nio.channels.FileChannel.open(path)
              val buf = java.nio.ByteBuffer.allocate(len)
              try {
                var read = 0
                while (read < len) {
                  val r = ch.read(buf, lo + read)
                  require(r > 0, s"EOF at ${lo + read}")
                  read += r
                }
              } finally ch.close()
              ex.getResponseHeaders.set("Content-Range", s"bytes $lo-$hi/$size")
              ex.sendResponseHeaders(206, len)
              ex.getResponseBody.write(buf.array())
            }
          case _ =>
            ex.sendResponseHeaders(200, size)
            val out = ex.getResponseBody
            Files.copy(path, out)
        }
      }
    } catch {
      case _: Exception => try ex.sendResponseHeaders(500, -1) catch { case _: Exception => }
    } finally ex.close()
  }

  /** Register `path` under its file name and return the loopback URL. */
  def serve(path: String): String = {
    val p = Paths.get(path)
    require(Files.exists(p), s"no such file: $path")
    val s = ensureStarted()
    val key = s"f${keySeq.incrementAndGet()}-${p.getFileName}"
    registry.put(key, p)
    s"http://127.0.0.1:${s.getAddress.getPort}/$key"
  }

  /** Register `path` under an EXACT url path (slashes allowed) and return
    * its URL — the hermetic stand-in for protocol layouts where the path
    * IS the contract (the HuggingFace hub tree: `api/datasets/{repo}` and
    * `datasets/{repo}/resolve/{rev}/{file}`). Re-registering a key
    * replaces it (a fixture building one repo tree per test run).
    */
  def serveAt(key: String, path: String): String = {
    val p = Paths.get(path)
    require(Files.exists(p), s"no such file: $path")
    val k = key.stripPrefix("/")
    require(k.nonEmpty, "serveAt: empty key")
    val s = ensureStarted()
    registry.put(k, p)
    s"http://127.0.0.1:${s.getAddress.getPort}/$k"
  }

  /** Base URL of the fixture server (an `endpoint` for [[serveAt]] trees). */
  def endpoint(): String = {
    val s = ensureStarted()
    s"http://127.0.0.1:${s.getAddress.getPort}"
  }

  /** Serve `path` with Range requests IGNORED (always 200 + full body) —
    * the degraded-server case the fetcher must survive by skipping. Uses its
    * own key namespace so a normal `serve()` of the same path keeps range
    * support (shared keys would retroactively poison earlier URLs).
    */
  def serveWithoutRanges(path: String): String = {
    val p = Paths.get(path)
    require(Files.exists(p), s"no such file: $path")
    val s = ensureStarted()
    val key = s"nr${keySeq.incrementAndGet()}-${p.getFileName}"
    registry.put(key, p)
    noRange.add(key)
    s"http://127.0.0.1:${s.getAddress.getPort}/$key"
  }
}
