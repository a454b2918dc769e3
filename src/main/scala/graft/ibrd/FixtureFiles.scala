package graft.ibrd

import java.nio.file.{Files, Path, Paths}
import graft.sources.DictLoader
import org.apache.spark.sql.types.{DoubleType, StringType}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialized fixture files under `fixtures/` (committed): the raw API
  * page as JSONL + the 10 dictionaries as CSVs — the SAME bytes read by
  * both engines, so the IBRD clean stage is DuckDB-oracle-checkable
  * (FIXTURES.md §1/§2). Regenerate with `runMain graft.ibrd.FixtureFiles`;
  * content is fully deterministic.
  */
object FixtureFiles {

  val root: Path = Paths.get("fixtures")
  val rawJsonl: Path = root.resolve("ibrd_raw.jsonl")

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def writeAll(): Unit = {
    Files.createDirectories(root)
    val fields = Model.rawSchema.fields
    val lines = Fixture.rawRows.map { row =>
      fields.zipWithIndex.flatMap { case (f, i) =>
        Option(row.get(i)).map { v =>
          val value = f.dataType match {
            case StringType => "\"" + esc(v.asInstanceOf[String]) + "\""
            case DoubleType => v.asInstanceOf[Double].toString
            case dt => sys.error(s"unexpected $dt")
          }
          "\"" + f.name + "\": " + value
        }
      }.mkString("{", ", ", "}")
    }
    Files.write(rawJsonl, lines.mkString("\n").getBytes)
    Fixture.allDicts.foreach { case (name, dict) =>
      DictLoader.write(dict, root.resolve("dicts").resolve(s"$name.csv"))
    }
  }

  /** The raw page read back from the committed JSONL with the explicit
    * 33-col schema (the offline S1 fixture reader, SURVEY.md §7 module 2). */
  def readRaw(spark: SparkSession, base: String = "."): DataFrame =
    spark.read.schema(Model.rawSchema).json(s"$base/${rawJsonl.toString}")

  def main(args: Array[String]): Unit = writeAll()
}
