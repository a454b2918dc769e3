package graft

import graft.ibrd.Fixture
import graft.sources.{DictLoader, PageTransport, PagedCursor, PagedSource, TableSink}
import org.apache.spark.sql.functions._

/** Test transports live at top level so they capture no outer spec
  * reference (they are serialized into tasks). */
object SourcesSpecTransports {
  object Flaky503 extends PageTransport {
    override def fetch(offset: Int, count: Int): PageTransport.Response =
      if (offset >= 100) PageTransport.Response(503, Nil)
      else PageTransport.FixtureTransport.fetch(offset, count)
  }
  /** Server clamps every page to at most 30 rows regardless of `top`. */
  object Clamp30 extends PageTransport {
    override def fetch(offset: Int, count: Int): PageTransport.Response =
      PageTransport.Response(200,
        Fixture.rawRows.slice(offset, offset + math.min(count, 30)))
  }
  /** Throttles each page's first two fetches (429), then serves it —
    * the transient-blip shape the in-reader retry must absorb. */
  object Throttled extends PageTransport {
    val attempts = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicInteger]()
    def reset(): Unit = attempts.clear()
    override def fetch(offset: Int, count: Int): PageTransport.Response = {
      val n = attempts.computeIfAbsent(offset,
        _ => new java.util.concurrent.atomic.AtomicInteger()).incrementAndGet()
      if (n <= 2) PageTransport.Response(429, Nil)
      else PageTransport.FixtureTransport.fetch(offset, count)
    }
  }
  /** Permanent client error: must fail fast, never retry. */
  object Gone404 extends PageTransport {
    val calls = new java.util.concurrent.atomic.AtomicInteger()
    override def fetch(offset: Int, count: Int): PageTransport.Response = {
      calls.incrementAndGet()
      PageTransport.Response(404, Nil)
    }
  }
}

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

  test("paged source: non-200 transport fails the read like the reference raise") {
    PageTransport.register("flaky503", SourcesSpecTransports.Flaky503)
    val df = spark.read.format("graft.sources.PagedDataSourceV2")
      .option("pageSize", "50").option("transport", "flaky503")
      .option("maxRetries", "0") // the raise path itself, no retry layer
      .load()
    val e = intercept[Exception] { df.count() }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msgs.contains("HTTP 503"), s"got: $msgs")
  }

  test("paged source: transient 429s are absorbed by in-reader retry") {
    SourcesSpecTransports.Throttled.reset()
    PageTransport.register("throttled", SourcesSpecTransports.Throttled)
    val df = spark.read.format("graft.sources.PagedDataSourceV2")
      .option("pageSize", "50").option("transport", "throttled")
      .option("retryBaseMs", "1").load()
    assert(df.count() == Fixture.nRows) // full read despite 2 blips/page
    // every page paid exactly 2 failures + 1 success — and the throttle
    // was per-page, so retries never re-fetched a neighboring page
    import scala.jdk.CollectionConverters._
    val attempts = SourcesSpecTransports.Throttled.attempts.asScala
    assert(attempts.size == 5) // ceil(220/50) pages
    assert(attempts.values.forall(_.get == 3), attempts.toString)
  }

  test("paged source: permanent 4xx fails fast without retry") {
    SourcesSpecTransports.Gone404.calls.set(0)
    PageTransport.register("gone404", SourcesSpecTransports.Gone404)
    val df = spark.read.format("graft.sources.PagedDataSourceV2")
      .option("pageSize", "300").option("transport", "gone404")
      .option("retryBaseMs", "1").load() // one page -> one task
    val e = intercept[Exception] { df.count() }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msgs.contains("HTTP 404"), s"got: $msgs")
    assert(SourcesSpecTransports.Gone404.calls.get == 1,
      s"4xx must not retry, saw ${SourcesSpecTransports.Gone404.calls.get} calls")
  }

  test("paged source: partial pages surface exactly the rows the API returned") {
    PageTransport.register("clamp30", SourcesSpecTransports.Clamp30)
    val df = spark.read.format("graft.sources.PagedDataSourceV2")
      .option("pageSize", "50").option("transport", "clamp30").load()
    // 4 full pages clamped to 30 + the planner's own 20-row last page
    // (220 % 50) = 140 — exactly what the API returned, no invented rows
    assert(df.count() == 140)
  }

  test("paged cursor clamps at the dataset size (reference api_offset contract)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cursor")
    val cursor = new PagedCursor(dir.resolve("offset"), initial = 0L)
    val table = Tables.orders(spark, sf).withColumn("seq",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy("o_orderkey")).cast("long") - 1)
    val total = 10L
    // cursor beyond total: page is empty and commit holds at total
    cursor.write(total + 25)
    val page = PagedSource.nextPage(table, "seq", cursor, pageSize = 4, total = total)
    assert(page.lo == total && page.hi == total)
    assert(page.df.count() == 0)
    page.commit()
    assert(cursor.read() == total)
    // normal advance still clamps the final partial page
    cursor.write(8)
    val last = PagedSource.nextPage(table, "seq", cursor, pageSize = 4, total = total)
    assert(last.lo == 8 && last.hi == total)
    assert(last.df.count() == 2)
  }

  test("HttpPageTransport: GET top/skip pages against a local server, retry + raise paths") {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    import graft.sources.HttpPageTransport
    // the reference's API shape (pyspark_dag2.py:52-77): JSON body with a
    // `data` array; top/skip slice the record set
    val jsonRows = Fixture.raw(spark).toJSON.collect()
    val throttled = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicInteger]()
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def send(ex: HttpExchange, status: Int, body: String): Unit = {
      val bytes = body.getBytes("UTF-8")
      ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
      ex.close()
    }
    server.createContext("/api", { (ex: HttpExchange) =>
      val params = ex.getRequestURI.getQuery.split("&")
        .map(_.split("=", 2)).map(kv => kv(0) -> kv(1)).toMap
      val (top, skip) = (params("top").toInt, params("skip").toInt)
      // first hit per page is throttled: the reader's backoff must absorb it
      val n = throttled.computeIfAbsent(s"$skip",
        _ => new java.util.concurrent.atomic.AtomicInteger()).incrementAndGet()
      if (n == 1) send(ex, 429, "")
      else send(ex, 200,
        jsonRows.slice(skip, skip + top).mkString("{\"data\": [", ",", "]}"))
    })
    server.createContext("/gone", (ex: HttpExchange) => send(ex, 404, ""))
    // a 200 whose body has no `data` array (API reporting errors in-band)
    server.createContext("/nodata",
      (ex: HttpExchange) => send(ex, 200, "{\"error\": \"over quota\"}"))
    // a 200 with an EXPLICIT null data field — many serializers' encoding
    // of an empty list (a legal empty page, unlike the missing field)
    server.createContext("/nullpage",
      (ex: HttpExchange) => send(ex, 200, "{\"data\": null}"))
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      // URL-form option: no registration step — the pure-string-options path.
      // totalRows is mandatory here: the fixture default would silently
      // truncate a real endpoint (asserted below)
      val df = spark.read.format("graft.sources.PagedDataSourceV2")
        .option("pageSize", "50").option("transport", s"$base/api?type=json")
        .option("totalRows", Fixture.nRows.toString)
        .option("retryBaseMs", "1").load()
      val eMissing = intercept[Exception] {
        spark.read.format("graft.sources.PagedDataSourceV2")
          .option("transport", s"$base/api?type=json").load().count()
      }
      val missingMsgs = Iterator.iterate(eMissing: Throwable)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
      assert(missingMsgs.contains("totalRows"), s"got: $missingMsgs")
      // full fixture through real HTTP: 200s, a partial last page, and one
      // 429 per page absorbed in-reader
      assert(df.count() == Fixture.nRows)
      val a = df.orderBy("loan_number", "end_of_period").collect()
      val b = Fixture.raw(spark).orderBy("loan_number", "end_of_period").collect()
      assert(a.sameElements(b))
      assert(throttled.size == 5) // ceil(220/50) pages, throttle was per-page

      // permanent 4xx: fail fast, reader does not retry (matches the raise)
      PageTransport.register("http-gone", new HttpPageTransport(s"$base/gone"))
      val bad = spark.read.format("graft.sources.PagedDataSourceV2")
        .option("pageSize", "300").option("transport", "http-gone")
        .option("retryBaseMs", "1").load()
      val e = intercept[Exception] { bad.count() }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
      assert(msgs.contains("HTTP 404"), s"got: $msgs")

      // a 200 with no data array must FAIL (as retryable 599), never read
      // as a successful empty page — that would silently truncate the set
      PageTransport.register("http-nodata", new HttpPageTransport(s"$base/nodata"))
      val nodata = spark.read.format("graft.sources.PagedDataSourceV2")
        .option("pageSize", "300").option("transport", "http-nodata")
        .option("maxRetries", "1").option("retryBaseMs", "1").load()
      val e3 = intercept[Exception] { nodata.count() }
      val msgs3 = Iterator.iterate(e3: Throwable)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
      assert(msgs3.contains("HTTP 599"), s"got: $msgs3")

      // an explicit {"data": null} is a legal empty page, not an error
      PageTransport.register("http-nullpage", new HttpPageTransport(s"$base/nullpage"))
      val nullpage = spark.read.format("graft.sources.PagedDataSourceV2")
        .option("pageSize", "300").option("transport", "http-nullpage")
        .option("retryBaseMs", "1").load()
      assert(nullpage.count() == 0L)
    } finally server.stop(0)

    // connect failure (server down) maps to the synthetic 599 and is
    // retried as transient before the task fails
    PageTransport.register("http-dead",
      new HttpPageTransport(s"http://127.0.0.1:${server.getAddress.getPort}/api", timeoutMs = 500))
    val dead = spark.read.format("graft.sources.PagedDataSourceV2")
      .option("pageSize", "300").option("transport", "http-dead")
      .option("maxRetries", "1").option("retryBaseMs", "1").load()
    val e2 = intercept[Exception] { dead.count() }
    val msgs2 = Iterator.iterate(e2: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msgs2.contains("HTTP 599") && msgs2.contains("2 attempts"), s"got: $msgs2")
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

  test("table sink: jdbc round-trips append+overwrite through embedded Derby") {
    // a REAL JDBC database in-process (Derby ships with Spark's jars):
    // exercises the reference's online sink shape end-to-end —
    // df.write.jdbc append/overwrite + spark.read.jdbc — with the
    // reference's staging types (SURVEY §1.2): decimal(18,2), date,
    // boolean, bigint, varchar
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val url = "jdbc:derby:memory:graftsink;create=true"
    val sink = new TableSink("/unused", jdbc = Some(TableSink.JdbcConfig(
      url, Map("driver" -> "org.apache.derby.iapi.jdbc.AutoloadedDriver"))))
    val schema = StructType(Seq(
      StructField("loan_id", LongType, nullable = false),
      StructField("amount", DecimalType(18, 2)),
      StructField("board_dt", DateType),
      StructField("is_current", BooleanType),
      StructField("status", StringType)))
    val rows = Seq(
      Row(1L, BigDecimal("12345678901234.56").bigDecimal,
        java.sql.Date.valueOf("2024-01-31"), true, "Repaid"),
      Row(2L, BigDecimal("-0.01").bigDecimal,
        java.sql.Date.valueOf("1999-12-31"), false, "Cancelled"),
      Row(3L, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    sink.append(df, "LoanData")
    sink.append(df, "LoanData")
    assert(sink.read(spark, "LoanData").count() == 6)
    sink.overwrite(df, "LoanData")
    val back = sink.read(spark, "LoanData")
    assert(back.count() == 3)
    // types preserved through the database and back
    val bt = back.schema.fields.map(f => f.name.toLowerCase -> f.dataType).toMap
    assert(bt("loan_id") == LongType)
    assert(bt("amount") == DecimalType(18, 2))
    assert(bt("board_dt") == DateType)
    assert(bt("is_current") == BooleanType)
    // values: exact round-trip incl. negative decimal, nulls, date
    val byId = back.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getDecimal(1) ==
      BigDecimal("12345678901234.56").bigDecimal.setScale(2))
    assert(byId(1L).getDate(2) == java.sql.Date.valueOf("2024-01-31"))
    assert(byId(1L).getBoolean(3) && !byId(2L).getBoolean(3))
    assert(byId(2L).getDecimal(1).toPlainString == "-0.01")
    assert(byId(3L).isNullAt(1) && byId(3L).isNullAt(2) && byId(3L).isNullAt(4))
  }

  test("table sink: jdbc mode routes through df.write.jdbc (mock-URL failure)") {
    // no JDBC driver ships in this offline build, so the assertion is that
    // the sink actually took the jdbc path: the write must fail resolving
    // the fake driver/url — NOT silently land parquet under root
    val root = java.nio.file.Files.createTempDirectory("graft_jdbc").toString
    val sink = new TableSink(root, jdbc = Some(TableSink.JdbcConfig(
      "jdbc:sqlserver://127.0.0.1;databaseName=loans",
      Map("user" -> "u", "password" -> "p",
        "driver" -> "com.example.absent.Driver"))))
    val df = Tables.region(spark, sf)
    val e = intercept[Exception] { sink.append(df, "LoanData") }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(m => s"${m.getClass.getName}: ${m.getMessage}").mkString(" | ")
    assert(msgs.contains("com.example.absent.Driver") || msgs.toLowerCase.contains("jdbc"),
      s"got: $msgs")
    // and nothing leaked into the parquet root
    assert(!java.nio.file.Files.list(java.nio.file.Paths.get(root)).findAny().isPresent)
  }
}
