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
  * Serializable by construction: the client is `@transient lazy`, so
  * each executor builds its own on first fetch and only the
  * configuration strings ship inside the task.
  */
final class HttpPageTransport(
    baseUrl: String,
    schema: StructType = Model.rawSchema,
    topParam: String = "top",
    skipParam: String = "skip",
    dataField: String = "data",
    timeoutMs: Long = 30000L) extends PageTransport {

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(timeoutMs))
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()

  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  override def fetch(offset: Int, count: Int): PageTransport.Response = {
    val sep = if (baseUrl.contains("?")) "&" else "?"
    val uri = URI.create(s"$baseUrl$sep$topParam=$count&$skipParam=$offset")
    val request = HttpRequest.newBuilder(uri)
      .timeout(Duration.ofMillis(timeoutMs))
      .GET().build()
    val response =
      try client.send(request, HttpResponse.BodyHandlers.ofString())
      catch {
        case _: java.io.IOException => return PageTransport.Response(599, Nil)
      }
    if (response.statusCode() != 200)
      PageTransport.Response(response.statusCode(), Nil)
    else PageTransport.Response(200, parse(response.body()))
  }

  private def parse(body: String): Seq[Row] = {
    val data = mapper.readTree(body).get(dataField)
    if (data == null || !data.isArray) Seq.empty
    else (0 until data.size).map { i =>
      val node = data.get(i)
      val values = schema.fields.map { f =>
        val v = node.get(f.name)
        if (v == null || v.isNull) null
        else f.dataType match {
          case DoubleType => Double.box(v.asDouble())
          case _ => v.asText()
        }
      }
      Row(values.toIndexedSeq: _*)
    }
  }
}
