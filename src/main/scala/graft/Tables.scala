package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the harness TESTDATA tables (TESTDATA.md): TPC-H-ish star
  * schema + `events` + `documents`/`embeddings`, one parquet per table under
  * the scale-factor dir passed by the driver.
  *
  * Always load through here so every query reads the same way (schema comes
  * from parquet footers; Catalyst prunes columns / pushes filters into the
  * scan).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  /** `events` with `ts` normalized to the engine's internal contract:
    * nanoseconds-since-epoch as LongType. Generator vintages differ —
    * TIMESTAMP(NANOS) parquet arrives as raw ns long (via the
    * `nanosAsLong` session flag), TIMESTAMP(MICROS) as TimestampType/
    * TimestampNTZType — so the loader, not every query, absorbs the
    * difference. NTZ→epoch is evaluated under the session time zone;
    * all entry points pin it to UTC, matching DuckDB's `epoch_ns`,
    * which also reads naive timestamps as UTC. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = apply(s, d, "events")
    val tsNs: Option[Column] = raw.schema("ts").dataType match {
      case LongType         => None // already raw nanoseconds
      case TimestampType    => Some(unix_micros(col("ts")) * 1000L)
      case TimestampNTZType =>
        Some(unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case other => throw new IllegalStateException(
        s"events.ts: unsupported parquet type $other")
    }
    tsNs.fold(raw)(c => raw.withColumn("ts", c))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}

/** One catalog entry: the Spark query plus (when SQL-expressible) the exact
  * DuckDB oracle over the same parquet tables. Column names/aliases MUST
  * match between the two — the driver sorts columns by name before hashing.
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

trait QueryPack {
  /** name -> query; names are globally unique across packs. */
  def queries: Map[String, Q]
}
