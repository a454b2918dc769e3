package graft

import graft.ibrd.Fixture
import graft.sources.{DictLoader, TableSink}
import org.apache.spark.sql.functions._

/** Source/sink operators (SURVEY.md §2.1): DSv2 paged reader, CSV dict
  * loader, parquet table sink. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("DataSourceV2 paged source: one partition per page, full fixture") {
    val df = spark.read.format("graft.sources.PagedDataSourceV2")
      .option("pageSize", "50").load()
    assert(df.schema == graft.ibrd.Model.rawSchema)
    assert(df.rdd.getNumPartitions == 5) // ceil(220/50)
    assert(df.count() == Fixture.nRows)
    // content identical to the in-memory fixture
    val a = df.orderBy("loan_number", "end_of_period").collect()
    val b = Fixture.raw(spark).orderBy("loan_number", "end_of_period").collect()
    assert(a.sameElements(b))
  }

  test("paged source respects pageSize option boundaries") {
    val df = spark.read.format("graft.sources.PagedDataSourceV2")
      .option("pageSize", "219").load()
    assert(df.rdd.getNumPartitions == 2)
    assert(df.count() == 220)
  }

  test("CSV dictionary round-trip preserves entries incl. commas and case-folding") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dicts")
    Fixture.allDicts.foreach { case (name, dict) =>
      DictLoader.write(dict, dir.resolve(s"$name.csv"))
    }
    val loaded = DictLoader.load(spark, dir.resolve("Countries_Cleaning.csv").toString)
    assert(loaded == Fixture.countriesCleaning) // keys already lower-cased
    assert(loaded.contains("macedonia, former yugoslav republic"))
    val bk = DictLoader.load(spark, dir.resolve("country_BK.csv").toString)
    assert(bk("israel") == "4")
  }

  test("table sink: append accretes, overwrite replaces (S4/S5 semantics)") {
    val root = java.nio.file.Files.createTempDirectory("graft_wh").toString
    val sink = new TableSink(root)
    val df = Tables.region(spark, sf)
    sink.append(df, "region")
    sink.append(df, "region")
    assert(sink.read(spark, "region").count() == df.count() * 2)
    sink.overwrite(df, "region")
    assert(sink.read(spark, "region").count() == df.count())
  }
}
