package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Warehouse table sink (SURVEY.md §2.1 S4/S5/S8): the reference lands
  * staging via JDBC `append`/`overwrite` and dims/fact via OLE DB
  * fast-load. Offline the table store is a parquet directory per table;
  * the same API shape would target JDBC/Delta in prod — at scale parquet
  * dirs ARE the right sink (columnar, splittable, predicate-pushdown on
  * re-read), where the reference's row-wise JDBC insert was the
  * bottleneck.
  */
final class TableSink(root: String) {

  def append(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Append).parquet(s"$root/$table")

  def overwrite(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(s"$root/$table")

  def read(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(s"$root/$table")
}

object TableSink {
  /** Bucketed + sorted catalog table: co-locates subsequent joins and
    * aggregations on the bucket key (no Exchange in the plan) — the
    * deployment-time answer to the fact-side shuffle called out in
    * SCALE.md. Requires a catalog (`saveAsTable`), hence separate from
    * the plain parquet-dir sink. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    cols: Seq[String], path: Option[String] = None): Unit = {
    val w = df.write
      .bucketBy(buckets, cols.head, cols.tail: _*)
      .sortBy(cols.head, cols.tail: _*)
      .mode(SaveMode.Overwrite)
      .format("parquet")
    // explicit path → external table: data lands under the caller's dir
    // instead of the session warehouse (which defaults to ./spark-warehouse
    // in driver runs); the catalog still carries the bucketing metadata
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }
}
