package graft.pipeline

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

/** REST implementation of the chunked-sink contract (publish.py:41-97):
  * the reference clears the sheet, writes a header row, then appends
  * rows in 50k-row REST calls (`worksheet.append_rows`, publish.py:85-90).
  * This sink speaks the same shape to any HTTP endpoint:
  *
  *   - clear        → DELETE {base}/tables/{table}/rows
  *   - header/chunk → POST   {base}/tables/{table}/rows
  *                    body {"rows": [[...], ...]} (header is the first
  *                    single-row append, exactly like the reference)
  *
  * Rows are JSON-encoded: null → null, numbers stay numbers, everything
  * else is a JSON string — mirroring the reference's USER_ENTERED value
  * semantics where the receiving end interprets typed cells.
  *
  * Reliability: every call retries on 429/5xx with bounded exponential
  * backoff (`maxRetries`, `retryBaseMillis`) — the reference's real
  * endpoint (Sheets REST) rate-limits exactly this way, and a 50k-chunk
  * publish that dies on one transient 429 would otherwise leave the
  * table half-written. 4xx other than 429 never retries (it won't get
  * better).
  *
  * Driver-side by design: Publish streams the row-capped result through
  * toLocalIterator (bounded by the reference's own 50k cap), so the
  * sink never sees more than one chunk in memory.
  */
class HttpChunkedSink(
    baseUrl: String,
    client: HttpClient = HttpClient.newHttpClient(),
    maxRetries: Int = 4,
    retryBaseMillis: Long = 250,
) extends ChunkedSink {

  private def tableUri(table: String): URI =
    URI.create(s"$baseUrl/tables/$table")

  private def rowsUri(table: String): URI =
    URI.create(s"$baseUrl/tables/$table/rows")

  /** Create-if-missing (publish.py:64-68: worksheet lookup → on
    * WorksheetNotFound, add_worksheet): GET the table resource; on 404,
    * PUT it into existence.
    */
  override def ensure(table: String): Unit = {
    val got = sendRaw(HttpRequest.newBuilder(tableUri(table)).GET().build())
    if (got.statusCode() == 404)
      send(HttpRequest.newBuilder(tableUri(table))
        .PUT(HttpRequest.BodyPublishers.noBody()).build())
    else if (got.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"sink GET ${tableUri(table)} -> HTTP ${got.statusCode()}: ${got.body()}")
  }

  override def clear(table: String): Unit =
    send(HttpRequest.newBuilder(rowsUri(table)).DELETE().build())

  override def appendHeader(table: String, columns: Seq[String]): Unit =
    appendChunk(table, Seq(columns))

  override def appendChunk(table: String, rows: Seq[Seq[Any]]): Unit =
    send(
      HttpRequest.newBuilder(rowsUri(table))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(encode(rows), StandardCharsets.UTF_8))
        .build()
    )

  /** Send with bounded exponential backoff on 429/5xx; returns the
    * final response whatever its status (callers decide what a non-2xx
    * means — `ensure` treats 404 as "create it").
    */
  private def sendRaw(req: HttpRequest): HttpResponse[String] = {
    var attempt = 0
    var resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    while (attempt < maxRetries &&
      (resp.statusCode() == 429 || resp.statusCode() / 100 == 5)) {
      Thread.sleep(retryBaseMillis << attempt) // 1x, 2x, 4x, 8x base
      attempt += 1
      resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    }
    resp
  }

  private def send(req: HttpRequest): Unit = {
    val resp = sendRaw(req)
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"sink ${req.method()} ${req.uri()} -> HTTP ${resp.statusCode()}: ${resp.body()}")
  }

  /** Minimal JSON writer for {"rows": [[...], ...]} — no dependencies. */
  private def encode(rows: Seq[Seq[Any]]): String = {
    val sb = new StringBuilder("{\"rows\":[")
    var firstRow = true
    rows.foreach { row =>
      if (!firstRow) sb.append(',')
      firstRow = false
      sb.append('[')
      var firstCell = true
      row.foreach { cell =>
        if (!firstCell) sb.append(',')
        firstCell = false
        sb.append(encodeCell(cell))
      }
      sb.append(']')
    }
    sb.append("]}").toString()
  }

  private def encodeCell(v: Any): String = v match {
    case null => "null"
    case n: Int => n.toString
    case n: Long => n.toString
    case n: Double =>
      if (n.isNaN || n.isInfinite) "null" else n.toString // X7/X8 belt-and-braces
    case n: Float => encodeCell(n.toDouble)
    case n: Short => n.toString
    case n: Byte => n.toString
    case b: Boolean => b.toString
    case n: java.math.BigDecimal => n.toPlainString
    case other => quote(other.toString)
  }

  private def quote(s: String): String = graft.util.Json.str(s)
}
