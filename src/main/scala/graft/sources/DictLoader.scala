package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** CSV dictionary reader (SURVEY.md §2.1 S3): the reference loads 10 small
  * `key,value` CSVs into driver-side dicts, lower-casing keys and values
  * and skipping the header (`pyspark_dag2.py:139-264`).
  *
  * The collected Map is intentional — these dictionaries are broadcast-
  * sized by contract (recode tables), and the callers inline them as
  * `typedLit` maps so the lookup codegens instead of joining.
  */
object DictLoader {

  def load(spark: SparkSession, path: String): Map[String, String] = {
    val df = spark.read.option("header", "true").csv(path)
    val Array(k, v) = df.columns.take(2)
    df.select(lower(col(k)), lower(col(v)))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  /** Write a dictionary as a `key,value` CSV (fixture round-trip). */
  def write(dict: Map[String, String], path: java.nio.file.Path): Unit = {
    def q(s: String): String =
      if (s.contains(",") || s.contains("\"")) "\"" + s.replace("\"", "\"\"") + "\"" else s
    val lines = "key,value" +: dict.toSeq.sortBy(_._1).map { case (k, v) => s"${q(k)},${q(v)}" }
    java.nio.file.Files.createDirectories(path.getParent)
    java.nio.file.Files.write(path, lines.mkString("\n").getBytes)
  }
}
