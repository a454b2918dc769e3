package graft.sources

import java.util
import graft.ibrd.{Fixture, Model}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.{DoubleType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Executor-side page transport — the REST-call seam of the paged source.
  * The reference's contract (`pyspark_dag2.py:52-77`): GET with
  * `top`/`skip`; a non-200 status RAISES (`:61-64,75-77` — the batch
  * fails and the cursor does not advance); a 200 may carry fewer rows
  * than requested (the clamped last page). Implementations must be
  * Serializable: the instance is resolved on the driver at scan
  * planning and shipped inside each task, so the same seam works on a
  * real cluster. [[HttpPageTransport]] is the `java.net.http` online
  * implementation; offline tests inject failing/partial transports
  * through the registry — no network needed to exercise the error paths.
  */
trait PageTransport extends Serializable {
  def fetch(offset: Int, count: Int): PageTransport.Response
}

object PageTransport {
  /** `status` mirrors the HTTP status; `rows` may be shorter than the
    * requested count (partial/clamped page). */
  final case class Response(status: Int, rows: Seq[org.apache.spark.sql.Row])

  /** Offline default: a deterministic fixture slice, always 200. */
  object FixtureTransport extends PageTransport {
    override def fetch(offset: Int, count: Int): Response =
      Response(200, Fixture.rawRows.slice(offset, offset + count))
  }

  // DSv2 sources are instantiated reflectively from string options, so
  // transports are injected by registered name (driver-side lookup).
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, PageTransport]()
  registry.put("fixture", FixtureTransport)

  def register(name: String, t: PageTransport): Unit = registry.put(name, t)

  def isUrl(name: String): Boolean =
    name.startsWith("http://") || name.startsWith("https://")

  /** Registered name, or a URL: `transport=https://host/path?x=y` builds
    * an [[HttpPageTransport]] directly, so the online source works from
    * pure string options (`spark.read.format(...).option("transport",
    * url)`) with no driver-side registration step (pass `totalRows` too —
    * the fixture default would truncate a remote dataset). */
  def resolve(name: String): PageTransport =
    if (isUrl(name)) new HttpPageTransport(name)
    else {
      val t = registry.get(name)
      require(t != null,
        s"unknown page transport '$name' (register one, or pass an http(s):// URL)")
      t
    }
}

/** DataSourceV2 paged source (SURVEY.md §2.1 S1): the reference pages the
  * World Bank catalog API with `top`/`skip` (50k rows/page,
  * `pyspark_dag2.py:37-42,52-77`). This is the Spark-native shape SURVEY
  * prescribes — a `Batch` with ONE `InputPartition` PER PAGE, so page
  * fetches run in parallel on executors instead of a driver loop, and a
  * 1000-executor cluster pulls 1000 pages at once.
  *
  * Offline the "API" is the deterministic in-repo fixture
  * ([[graft.ibrd.Fixture]]); a real HTTP reader swaps only the
  * [[PageTransport]] (option `transport`).
  *
  * Usage: `spark.read.format("graft.sources.PagedDataSourceV2")
  *   .option("pageSize", "50").load()`
  */
class PagedDataSourceV2 extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = Model.rawSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PagedTable(schema)
}

final class PagedTable(schema: StructType) extends Table with SupportsRead {
  override def name(): String = "ibrd_api_pages"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val transport = options.getOrDefault("transport", "fixture")
    // the totalRows default is the FIXTURE's row count — right for the
    // offline transports, but against a real endpoint it would silently
    // plan ceil(220/pageSize) pages and truncate the dataset to 220 rows
    require(!PageTransport.isUrl(transport) || options.containsKey("totalRows"),
      "option 'totalRows' is required with a URL transport — the fixture " +
        s"default (${Fixture.nRows}) would silently truncate the remote dataset " +
        "(the reference pins it too: rows=1342181, pyspark_dag2.py:39)")
    () => new PagedScan(schema,
      options.getInt("pageSize", 50),
      options.getInt("totalRows", Fixture.nRows),
      PageTransport.resolve(transport),
      options.getInt("maxRetries", 3),
      options.getLong("retryBaseMs", 100L))
  }
}

final class PagedScan(schema: StructType, pageSize: Int, totalRows: Int,
                      transport: PageTransport, maxRetries: Int = 3,
                      retryBaseMs: Long = 100L)
    extends Scan with Batch {
  require(pageSize > 0, s"option 'pageSize' must be positive, got $pageSize")
  require(maxRetries >= 0, s"option 'maxRetries' must be >= 0, got $maxRetries")
  require(retryBaseMs >= 0, s"option 'retryBaseMs' must be >= 0, got $retryBaseMs")
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft paged source: ${math.ceil(totalRows.toDouble / pageSize).toInt} pages x $pageSize rows"

  override def planInputPartitions(): Array[InputPartition] =
    (0 until totalRows by pageSize)
      .map(off => PagedInputPartition(off, math.min(pageSize, totalRows - off))
        .asInstanceOf[InputPartition]).toArray

  // a dedicated Serializable factory: a lambda here would capture `this`
  // (the non-serializable Scan) and fail task serialization
  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(transport, maxRetries, retryBaseMs)
}

final class PagedReaderFactory(transport: PageTransport, maxRetries: Int,
                               retryBaseMs: Long)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagedInputPartition]
    new PagedPartitionReader(p.offset, p.count, transport, maxRetries, retryBaseMs)
  }
}

final case class PagedInputPartition(offset: Int, count: Int) extends InputPartition

/** Reads one page through the injected [[PageTransport]] (executor-side).
  *
  * TRANSIENT statuses (429, 5xx) are retried in-reader with exponential
  * backoff (`maxRetries` × `retryBaseMs·2^attempt`) — at 1000 parallel
  * page fetches, transient throttles are the NORM, and a task-level
  * retry would re-pay task setup per blip (and in local mode
  * `spark.task.maxFailures=1` would kill the whole job on one 503).
  * Other non-200s (permanent 4xx) raise IMMEDIATELY, failing the task
  * like the reference's raise (`pyspark_dag2.py:75-77`) fails the
  * Airflow task — Spark's task retry then re-fetches the SAME page (the
  * partition pins offset/count), the at-least-once contract the cursor
  * design expects. */
final class PagedPartitionReader(offset: Int, count: Int,
                                 transport: PageTransport,
                                 maxRetries: Int = 3, retryBaseMs: Long = 100L)
    extends PartitionReader[InternalRow] {

  // 501 (Not Implemented) and 505 (Version Not Supported) are permanent
  // server answers, not blips — retrying them just burns the budget
  private def retryable(status: Int): Boolean =
    status == 429 ||
      (status >= 500 && status < 600 && status != 501 && status != 505)

  private def fetchPage(): Iterator[org.apache.spark.sql.Row] = {
    var attempt = 0
    while (true) {
      val resp = transport.fetch(offset, count)
      if (resp.status == 200) return resp.rows.iterator
      if (!retryable(resp.status) || attempt >= maxRetries)
        throw new java.io.IOException(
          s"Failed to fetch page at offset=$offset: HTTP ${resp.status}" +
            (if (attempt > 0) s" after ${attempt + 1} attempts" else ""))
      // cap the shift: a large maxRetries must saturate the backoff, not
      // overflow the long into a negative sleep
      Thread.sleep(retryBaseMs << math.min(attempt, 20))
      attempt += 1
    }
    throw new IllegalStateException("unreachable")
  }

  private val proj = UnsafeProjection.create(Model.rawSchema)
  private val it = fetchPage()
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (!it.hasNext) return false
    val row = it.next()
    val values = Model.rawSchema.fields.zipWithIndex.map { case (f, i) =>
      (f.dataType, row.get(i)) match {
        case (_, null) => null
        case (StringType, s: String) => UTF8String.fromString(s)
        case (DoubleType, d: Double) => d
        case (dt, v) => throw new IllegalStateException(s"unexpected $dt / $v")
      }
    }
    current = proj(new GenericInternalRow(values.asInstanceOf[Array[Any]]))
    true
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
