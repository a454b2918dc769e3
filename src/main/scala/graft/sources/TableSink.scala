package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Warehouse table sink (SURVEY.md §2.1 S4/S5/S8): the reference lands
  * staging via JDBC `append`/`overwrite` into SQL Server
  * (`pyspark_dag2.py:428-440`) and dims/fact via OLE DB fast-load.
  *
  * Two modes behind one API:
  *  - parquet (default): a directory per table under `root`. Offline this
  *    IS the right sink at scale (columnar, splittable, predicate-pushdown
  *    on re-read), where the reference's row-wise JDBC insert was the
  *    bottleneck.
  *  - JDBC (`jdbc = Some(config)`): the reference's online shape —
  *    `df.write.jdbc` with the caller's url/properties, table names used
  *    verbatim. Reads come back through `spark.read.jdbc`, which pushes
  *    filters/projection to the database.
  */
final class TableSink(root: String,
                      jdbc: Option[TableSink.JdbcConfig] = None) {

  /** Identity of the storage this sink writes: the parquet root, or the
    * JDBC url (table names are used verbatim, so two sinks on one url ARE
    * the same tables). Used by batch loops to refuse reading and
    * overwriting the same storage in one job. */
  def location: String = jdbc.map(_.url).getOrElse(root)

  def append(df: DataFrame, table: String): Unit = write(df, table, SaveMode.Append)

  def overwrite(df: DataFrame, table: String): Unit = write(df, table, SaveMode.Overwrite)

  private def write(df: DataFrame, table: String, mode: SaveMode): Unit =
    jdbc match {
      case Some(c) => df.write.mode(mode).jdbc(c.url, table, c.asProperties)
      case None => df.write.mode(mode).parquet(s"$root/$table")
    }

  def read(spark: SparkSession, table: String): DataFrame =
    jdbc match {
      case Some(c) => spark.read.jdbc(c.url, table, c.asProperties)
      case None => spark.read.parquet(s"$root/$table")
    }
}

object TableSink {

  /** JDBC connection config (url + user/password/driver etc. — the same
    * property map the reference passes, `pyspark_dag2.py:428-440`). */
  final case class JdbcConfig(url: String,
                              properties: Map[String, String] = Map.empty) {
    def asProperties: java.util.Properties = {
      val p = new java.util.Properties()
      properties.foreach { case (k, v) => p.setProperty(k, v) }
      p
    }
  }

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
