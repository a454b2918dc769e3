package graft.sources

import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cursor-checkpointed incremental ingestion — the Spark re-expression of
  * the reference's paged REST source (SURVEY.md §2.1 S1, §2.9 R1:
  * `pyspark_dag2.py:37-42,52-77` — 50k-row pages, cursor persisted in an
  * Airflow Variable, hourly micro-batches, clamped at the dataset size).
  *
  * Offline, the page provider is a range predicate over an ordered key of
  * an existing table (predicate pushdown makes each page a pruned scan);
  * the same cursor/checkpoint contract would wrap a REST DataSourceV2
  * reader online. The cursor file is the Airflow-Variable analogue.
  */
final class PagedCursor(checkpoint: Path, initial: Long = 0L) {
  def read(): Long =
    if (Files.exists(checkpoint)) new String(Files.readAllBytes(checkpoint)).trim.toLong
    else initial
  def write(v: Long): Unit = {
    Files.createDirectories(checkpoint.getParent)
    Files.write(checkpoint, v.toString.getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }
}

object PagedSource {

  /** One micro-batch page: the DataFrame plus a `commit` that advances the
    * cursor. Commit AFTER the page's action succeeds — advancing eagerly
    * would skip the page forever if the batch fails (the reference's
    * Airflow Variable likewise only moves after a successful load). */
  final case class Page(df: DataFrame, lo: Long, hi: Long, commit: () => Unit)

  /** Rows with `keyCol` in [cursor, cursor+pageSize), clamped like the
    * reference's `api_offset`. */
  def nextPage(table: DataFrame, keyCol: String, cursor: PagedCursor,
               pageSize: Long, total: Long): Page = {
    val lo = math.min(cursor.read(), total)
    val hi = math.min(lo + pageSize, total)
    Page(table.filter(col(keyCol) >= lo && col(keyCol) < hi),
      lo, hi, () => cursor.write(hi))
  }

  /** Accumulate `nPages` micro-batches (the notebook's union-in-a-loop,
    * SURVEY §2.8 O2) starting from offset 0. */
  def ingestPages(table: DataFrame, keyCol: String, pageSize: Long,
                  nPages: Int): DataFrame = {
    val pages = (0 until nPages).map { i =>
      table.filter(col(keyCol) >= i.toLong * pageSize &&
        col(keyCol) < (i.toLong + 1) * pageSize)
    }
    pages.reduce(_ unionByName _)
  }
}
