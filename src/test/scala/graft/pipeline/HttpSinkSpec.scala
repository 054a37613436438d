package graft.pipeline

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkTestBase

/** HTTP chunked sink against a local stub server (VERDICT r1 missing
  * #2): asserts the reference's publish contract — ensure-exists, clear
  * first, header row first append, then fixed-size chunks
  * (publish.py:64-68,74,78-79,85-90) — as observed from the receiving
  * end. The stub models a minimal table store: GET /tables/{t} is 404
  * until PUT creates it, mirroring the reference's
  * WorksheetNotFound → add_worksheet flow.
  */
class HttpSinkSpec extends SparkTestBase {

  /** (method, path, nRows) per request; nRows = -1 for bodyless calls. */
  private final case class Req(method: String, path: String, nRows: Int)

  /** @param preExisting  tables the store already has
    * @param failFirst    inject this many 429 responses before behaving
    */
  private def withStubServer(preExisting: Set[String] = Set.empty, failFirst: Int = 0)(
      f: (String, () => Seq[Req]) => Unit): Unit = {
    val requests = scala.collection.mutable.ArrayBuffer.empty[Req]
    val tables = scala.collection.mutable.Set[String](preExisting.toSeq: _*)
    val failures = new AtomicInteger(failFirst)
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext(
      "/",
      (ex: HttpExchange) => {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val method = ex.getRequestMethod
        val path = ex.getRequestURI.getPath
        // {"rows":[[...],[...]]} → row count = number of '[' minus the outer one
        val n = if (body.isEmpty) -1 else body.count(_ == '[') - 1
        requests.synchronized { requests += Req(method, path, n) }
        val status =
          if (failures.getAndUpdate(x => math.max(0, x - 1)) > 0) 429
          else
            path.split("/").toList match {
              case List("", "tables", t) =>
                method match {
                  case "GET" => if (tables.synchronized(tables(t))) 200 else 404
                  case "PUT" => tables.synchronized(tables += t); 201
                  case _ => 405
                }
              case List("", "tables", t, "rows") =>
                // rows endpoints require the table to exist — the stub
                // enforces what a real store would.
                if (tables.synchronized(tables(t))) 200 else 404
              case _ => 404
            }
        ex.sendResponseHeaders(status, 0)
        ex.getResponseBody.close()
      },
    )
    server.start()
    try f(s"http://localhost:${server.getAddress.getPort}", () => requests.toSeq)
    finally server.stop(0)
  }

  private def fastSink(base: String) =
    new HttpChunkedSink(base, retryBaseMillis = 5)

  test("ensure → clear → header → 50k-chunk contract over HTTP") {
    import sqlImplicits._
    withStubServer(preExisting = Set("movie_facts")) { (base, recorded) =>
      val df = (1 to 5).map(i => (i.toLong, s"name$i", i * 1.5)).toDF("id", "name", "score")
      val published = Publish.publish(
        df.orderBy("id"), fastSink(base), "movie_facts",
        limit = None, chunkSize = 2,
      )
      assert(published == 5)

      val reqs = recorded()
      // ensure(GET) on the table resource, then DELETE, header(1 row),
      // then ceil(5/2)=3 chunks of 2,2,1 on the rows resource.
      assert(reqs.map(_.method) == Seq("GET", "DELETE", "POST", "POST", "POST", "POST"))
      assert(reqs.head.path == "/tables/movie_facts")
      assert(reqs.tail.forall(_.path == "/tables/movie_facts/rows"))
      assert(reqs.map(_.nRows) == Seq(-1, -1, 1, 2, 2, 1))
    }
  }

  test("missing table is created before publish (publish.py:64-68 parity)") {
    import sqlImplicits._
    withStubServer() { (base, recorded) =>
      val df = (1 to 3).map(i => (i.toLong, s"n$i")).toDF("id", "name")
      val published = Publish.publish(
        df.orderBy("id"), fastSink(base), "fresh", limit = None, chunkSize = 10)
      assert(published == 3)
      // GET 404 → PUT create → normal contract.
      assert(recorded().map(_.method) == Seq("GET", "PUT", "DELETE", "POST", "POST"))
      assert(recorded().take(2).forall(_.path == "/tables/fresh"))
    }
  }

  test("row cap (S3) bounds what reaches the sink; empty frame skips it (F5)") {
    import sqlImplicits._
    withStubServer(preExisting = Set("big", "empty")) { (base, recorded) =>
      val df = (1 to 100).map(i => (i.toLong, s"n$i")).toDF("id", "name")
      val published = Publish.publish(
        df.orderBy("id"), fastSink(base), "big",
        limit = Some(10), chunkSize = 4,
      )
      assert(published == 10)
      assert(recorded().map(_.nRows) == Seq(-1, -1, 1, 4, 4, 2))

      val before = recorded().size
      val none = Publish.publish(
        Seq.empty[(Long, String)].toDF("id", "name"),
        fastSink(base), "empty", limit = None,
      )
      assert(none == 0L)
      assert(recorded().size == before) // no requests at all for empty input
    }
  }

  test("transient 429s are retried with backoff and the publish succeeds") {
    import sqlImplicits._
    withStubServer(preExisting = Set("flaky"), failFirst = 3) { (base, recorded) =>
      val df = (1 to 4).map(i => (i.toLong, s"n$i")).toDF("id", "name")
      val published = Publish.publish(
        df.orderBy("id"), fastSink(base), "flaky", limit = None, chunkSize = 10)
      assert(published == 4)
      // The first call (ensure GET) absorbed three 429s then succeeded;
      // row counts per successful call unchanged.
      val reqs = recorded()
      assert(reqs.count(r => r.method == "GET") == 4) // 3 rejected + 1 ok
      assert(reqs.map(_.method).filterNot(_ == "GET") == Seq("DELETE", "POST", "POST"))
      assert(reqs.map(_.nRows).filterNot(_ == -1) == Seq(1, 4))
    }
  }

  test("retries are bounded: a persistent failure still fails the publish") {
    import sqlImplicits._
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    val hits = new AtomicInteger(0)
    server.createContext(
      "/",
      (ex: HttpExchange) => {
        hits.incrementAndGet()
        ex.sendResponseHeaders(503, 0); ex.getResponseBody.close()
      },
    )
    server.start()
    try {
      val df = Seq((1L, "a")).toDF("id", "name")
      val sink = new HttpChunkedSink(
        s"http://localhost:${server.getAddress.getPort}",
        maxRetries = 2, retryBaseMillis = 5)
      intercept[java.io.IOException] {
        Publish.publish(df, sink, "t", limit = None)
      }
      assert(hits.get() == 3) // initial + 2 bounded retries, then fail-fast R1
    } finally server.stop(0)
  }
}
