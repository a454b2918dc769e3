package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import graft.ibrd.Model
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{DoubleType, StructType}

/** `java.net.http`-backed [[PageTransport]]: the online implementation of
  * the seam the offline tests exercise through injected stubs.
  *
  * Mirrors the reference's fetch (`pyspark_dag2.py:52-77`): GET
  * `baseUrl` with `top`/`skip` query params; a 200 body is JSON whose
  * `data` field holds an array of row objects (one JSON object per
  * record, fields matching the raw schema); any non-200 is returned
  * as-is for the reader's retry/raise policy (429/5xx backoff,
  * permanent 4xx raise — [[PagedPartitionReader]]). A transport-level
  * connect/read failure maps to a synthetic 599 so the same backoff
  * covers network blips — at 1000 parallel page fetches those are as
  * routine as throttles.
  *
  * Serializable by construction: only the configuration strings ship
  * inside the task; the client is resolved per JVM from a small
  * timeout-keyed cache (one selector thread + connection pool per
  * executor, not one per deserialized task instance).
  */
final class HttpPageTransport(
    baseUrl: String,
    schema: StructType = Model.rawSchema,
    topParam: String = "top",
    skipParam: String = "skip",
    dataField: String = "data",
    timeoutMs: Long = 30000L) extends PageTransport {

  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  override def fetch(offset: Int, count: Int): PageTransport.Response = {
    val sep = if (baseUrl.contains("?")) "&" else "?"
    val uri = URI.create(s"$baseUrl$sep$topParam=$count&$skipParam=$offset")
    val request = HttpRequest.newBuilder(uri)
      .timeout(Duration.ofMillis(timeoutMs))
      .GET().build()
    // the parse sits INSIDE the try: a 200 whose body was truncated by a
    // proxy throws JsonProcessingException (an IOException) — that is the
    // same transient network blip as a failed connect and must reach the
    // reader's backoff as the synthetic 599, not kill the task
    try {
      val response =
        HttpPageTransport.client(timeoutMs).send(request, HttpResponse.BodyHandlers.ofString())
      if (response.statusCode() != 200)
        PageTransport.Response(response.statusCode(), Nil)
      else PageTransport.Response(200, parse(response.body()))
    } catch {
      case e: java.io.IOException =>
        // the reader only sees the synthetic status; surface the cause on
        // executor stderr so an exhausted retry is diagnosable
        System.err.println(s"[paged-http] $uri -> 599: ${e.getMessage}")
        PageTransport.Response(599, Nil)
    }
  }

  private def parse(body: String): Seq[Row] = {
    val root = mapper.readTree(body)
    val data = root.get(dataField)
    // an explicit `"data": null` is a legal empty page (many serializers
    // emit null for an empty list past the last page) — but a 200 whose
    // JSON has no `dataField` at all, or a non-array value there, is not:
    // an API that reports errors in a 200 body ({"error": "over quota"}),
    // or a misconfigured dataField, would otherwise read as a successful
    // empty page and silently truncate the dataset (the reader treats
    // short 200 pages as the legal clamped last page). Raise as an
    // IOException so the enclosing catch maps it to the retryable 599 and
    // persistent cases fail the task with this message.
    if (data != null && data.isNull) return Seq.empty
    if (data == null || !data.isArray)
      throw new java.io.IOException(
        s"HTTP 200 body has no '$dataField' array (keys: " +
          s"${scala.jdk.CollectionConverters.IteratorHasAsScala(
            root.fieldNames).asScala.take(8).mkString(", ")})")
    (0 until data.size).map { i =>
      val node = data.get(i)
      val values = schema.fields.map { f =>
        val v = node.get(f.name)
        if (v == null || v.isNull) null
        else f.dataType match {
          // only genuinely numeric JSON lands in double fields: Jackson's
          // asDouble() coerces "N/A" to 0.0, which would be
          // indistinguishable from a real zero across the whole ingest
          case DoubleType => if (v.isNumber) Double.box(v.asDouble()) else null
          case _ => v.asText()
        }
      }
      Row(values.toIndexedSeq: _*)
    }
  }
}

object HttpPageTransport {
  // per-JVM client cache: HttpClient owns a selector thread and pool and
  // has no close() before Java 21 — one per timeout config, shared by
  // every task the executor runs
  private val clients =
    new java.util.concurrent.ConcurrentHashMap[Long, HttpClient]()

  private def client(timeoutMs: Long): HttpClient =
    clients.computeIfAbsent(timeoutMs, t =>
      HttpClient.newBuilder()
        .connectTimeout(Duration.ofMillis(t))
        .followRedirects(HttpClient.Redirect.NORMAL)
        .build())
}
