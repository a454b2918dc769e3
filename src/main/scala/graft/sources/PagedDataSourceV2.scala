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

/** DataSourceV2 paged source (SURVEY.md §2.1 S1): the reference pages the
  * World Bank catalog API with `top`/`skip` (50k rows/page,
  * `pyspark_dag2.py:37-42,52-77`). This is the Spark-native shape SURVEY
  * prescribes — a `Batch` with ONE `InputPartition` PER PAGE, so page
  * fetches run in parallel on executors instead of a driver loop, and a
  * 1000-executor cluster pulls 1000 pages at once.
  *
  * Offline the "API" is the deterministic in-repo fixture
  * ([[graft.ibrd.Fixture]]); a real HTTP reader swaps only
  * [[PagedPartitionReader.fetchPage]].
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
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new PagedScan(schema,
      options.getInt("pageSize", 50),
      options.getInt("totalRows", Fixture.nRows))
}

final class PagedScan(schema: StructType, pageSize: Int, totalRows: Int)
    extends Scan with Batch {
  require(pageSize > 0, s"option 'pageSize' must be positive, got $pageSize")
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft paged source: ${math.ceil(totalRows.toDouble / pageSize).toInt} pages x $pageSize rows"

  override def planInputPartitions(): Array[InputPartition] =
    (0 until totalRows by pageSize)
      .map(off => PagedInputPartition(off, math.min(pageSize, totalRows - off))
        .asInstanceOf[InputPartition]).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[PagedInputPartition]
      new PagedPartitionReader(p.offset, p.count)
    }
}

final case class PagedInputPartition(offset: Int, count: Int) extends InputPartition

/** Reads one page. `fetchPage` is the REST-call seam (executor-side). */
final class PagedPartitionReader(offset: Int, count: Int)
    extends PartitionReader[InternalRow] {

  private def fetchPage(): Iterator[org.apache.spark.sql.Row] =
    Fixture.rawRows.slice(offset, offset + count).iterator

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
