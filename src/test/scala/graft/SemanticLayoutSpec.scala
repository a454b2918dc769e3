package graft

import graft.ibrd.{Clean, Fixture, IbrdMeasures, IbrdWarehouse}
import graft.semantic.Layout
import org.apache.spark.sql.functions._

/** The exhaustive Layout-replay walk (VERDICT r9 §next-2): every one of
  * the reference report's 27 distinct `prototypeQuery` ASTs compiles
  * through the semantic layer and produces a sane result; the
  * consolidated q122 long format carries all of them. Content parity is
  * the q122 DuckDB oracle's job — this spec proves per-AST
  * compilability and the structural invariants the oracle can't see
  * (one frame per AST, schema, kind coverage). */
class SemanticLayoutSpec extends SparkSpec {
  import spark.implicits._

  private lazy val star =
    IbrdWarehouse.build(spark, Clean.stage(Fixture.raw(spark)).cache())

  test("transcription covers the Layout: 27 distinct ASTs, every kind present") {
    assert(Layout.all.size == 27)
    assert(Layout.all.map(_.idx) == (0 until 27))
    // the Layout's AST kind census (pbix!Report/Layout): 3 cards,
    // 13 column/bar/line measure visuals, 3 parameter slicers,
    // 5 field slicers (region, country, Year, Date x2 pages... Date+Year)
    val dataVisuals = Layout.all.filter(p => p.measures.nonEmpty)
    val paramSlicers = Layout.all.filter(_.slicerParam.isDefined)
    val dimSlicers = Layout.all.filter(_.slicerDim.isDefined)
    assert(dataVisuals.size == 20 && paramSlicers.size == 3 && dimSlicers.size == 4)
    assert(dataVisuals.count(_.groupBy.isEmpty) == 3) // the 3 cards
    // every one of the reference's 10 measures is exercised by some AST
    val used = dataVisuals.flatMap(_.measures).toSet
    assert(used == Set("Loans", "Loan Amount", "Repaid", "Due1",
      "Disbursed Amount", "Undisbursed Amount", "Average Inerest Rate",
      "Interest Income", "Guarantors", "Borrowers"))
    // and every grouping attribute the report uses
    assert(dataVisuals.flatMap(_.groupBy).toSet ==
      Set("loan_status", "loan_type", "borrower", "guarantor",
        "period_year", "period_date"))
  }

  test("transcription matches the pbix Report/Layout artifact itself") {
    // parse the REAL reference artifact (read-only) and prove the
    // hand-transcribed `Layout.all` is exactly its distinct
    // prototypeQuery set — the transcription cannot drift from the
    // artifact. Signatures are ORDER-INSENSITIVE select multisets (two
    // Layout ASTs may differ only in select order — e.g. the
    // Loans×loan_status chart appears select-flipped on two pages — so
    // the comparison is a MULTISET of sorted signatures on both sides).
    import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
    import scala.jdk.CollectionConverters._
    val pbix = new java.util.zip.ZipFile("/root/reference/Loans Dashboard.pbix")
    val layoutStr = try {
      new String(
        pbix.getInputStream(pbix.getEntry("Report/Layout")).readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_16LE)
    } finally pbix.close()
    val om = new ObjectMapper()
    val root = om.readTree(layoutStr)
    val distinctPqs = new java.util.LinkedHashSet[JsonNode]()
    for {
      s <- root.get("sections").elements().asScala
      vc <- Option(s.get("visualContainers")).toSeq.flatMap(_.elements().asScala)
      cfg = om.readTree(vc.get("config").asText)
      pq = cfg.path("singleVisual").path("prototypeQuery")
      if !pq.isMissingNode
    } distinctPqs.add(pq)
    assert(distinctPqs.size == 27, s"artifact has ${distinctPqs.size} distinct ASTs")
    def artifactSig(pq: JsonNode): String = {
      val froms = pq.get("From").elements().asScala
        .map(f => f.get("Name").asText -> f.get("Entity").asText).toMap
      pq.get("Select").elements().asScala.map { sel =>
        if (sel.has("Measure")) "M:" + sel.get("Measure").get("Property").asText
        else if (sel.has("HierarchyLevel"))
          "H:" + sel.get("HierarchyLevel").get("Level").asText
        else {
          val c = sel.get("Column")
          val src = c.get("Expression").get("SourceRef").get("Source").asText
          s"C:${froms(src)}.${c.get("Property").asText}"
        }
      }.toSeq.sorted.mkString("|")
    }
    // transcribed side: the same signature from each Proto's fields,
    // mapping OUR model columns back to the reference's entity.attribute
    val colSig = Map(
      "loan_status" -> "C:Dimension_LoanStatus.loan_status",
      "loan_type" -> "C:Dimension_LoanType.loan_type",
      "borrower" -> "C:Dimension_Borrower.borrower_name",
      "guarantor" -> "C:Dimension_Guarantor.guarantor",
      "region" -> "C:Dimension_Region.region",
      "country" -> "C:Dimension_Country.country",
      "period_year" -> "H:Year",
      "period_date" -> "C:DimDate.Date")
    def protoSig(p: Layout.Proto): String = {
      val parts =
        p.measures.map("M:" + _) ++
        p.groupBy.map(colSig).toSeq ++
        p.slicerDim.map { case (_, c) => colSig(c) }.toSeq ++
        p.slicerParam.map(pr => s"C:$pr.$pr").toSeq
      parts.sorted.mkString("|")
    }
    def multiset(xs: Seq[String]) = xs.groupBy(identity).view.mapValues(_.size).toMap
    val artifact = multiset(distinctPqs.asScala.toSeq.map(artifactSig))
    val transcribed = multiset(Layout.all.map(protoSig))
    assert(transcribed == artifact,
      s"transcription drift:\nonly in artifact: ${artifact.toSet -- transcribed.toSet}\n" +
        s"only transcribed: ${transcribed.toSet -- artifact.toSet}")
  }

  test("each of the 27 ASTs compiles individually and returns rows") {
    Layout.all.foreach { p =>
      val out = Layout.compile(star, p)
      val n = out.count()
      assert(n > 0, s"AST ${p.idx} (${p.page}/${p.visualType}) returned 0 rows")
      // cards collapse to one row; grouped visuals one row per attr value
      if (p.measures.nonEmpty && p.groupBy.isEmpty)
        assert(n == 1, s"card AST ${p.idx} must yield exactly 1 row")
    }
  }

  test("consolidated replay: one frame per AST, stable long schema") {
    val out = Layout.replay(star).cache()
    assert(out.columns.toSeq ==
      Seq("ast", "item", "grp", "value_num", "value_str"))
    val asts = out.select($"ast").distinct().as[Int].collect().sorted
    assert(asts.toSeq == (0 until 27))
    // measure rows carry numbers, slicer rows carry strings — never both
    assert(out.filter($"value_num".isNotNull && $"value_str".isNotNull).count() == 0)
    assert(out.filter($"value_num".isNull && $"value_str".isNull).count() == 0)
    // duplicate ASTs in the Layout (e.g. 2 vs 12, Loans x loan_status on
    // two pages) must replay to identical data points
    val a2 = out.filter($"ast" === 2).select($"item", $"grp", $"value_num")
    val a12 = out.filter($"ast" === 12).select($"item", $"grp", $"value_num")
    assert(a2.exceptAll(a12).isEmpty && a12.exceptAll(a2).isEmpty)
    // the card AST 0's Loans data point equals the fact row count
    val loans = out.filter($"ast" === 0 && $"item" === "Loans")
      .select($"value_num").as[Double].head()
    assert(loans == star.fact.count().toDouble)
    out.unpersist()
  }

  test("parameter slicers enumerate the declared option lists") {
    val out = Layout.replay(star)
    val opts = out.filter($"ast" === 3).select($"value_str")
      .as[String].collect().toSet
    assert(opts == IbrdMeasures.parameterOptions("PrmAmount&Repiad&Due").toSet)
  }

  test("page-wide cross-filter: selection propagation equals per-visual filtered recomputation (q131)") {
    // the q131 contract (VERDICT r10 §next-8): ONE crossFiltered model —
    // the slicer selection declared once, page-wide — must produce, for
    // every data visual of the page, exactly what that visual computes
    // when the filter is declared on it individually; slicer
    // enumerations must stay UNFILTERED (PBI's default interaction)
    val sel = col("region") === "africa"
    val page = Layout.all.filter(_.page == "LPO")
    val byAst = Layout.replayPage(star, "LPO", sel, IbrdMeasures.geoModel)
      .collect().groupBy(_.getAs[Int]("ast"))
    assert(byAst.keySet == page.map(_.idx).toSet, "every page AST replays")
    val model = IbrdMeasures.geoModel(star)
    def close(a: Option[Any], b: Option[Any]): Boolean = (a, b) match {
      case (Some(x: Double), Some(y: Double)) =>
        math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(y))
      case _ => a == b
    }
    page.filter(p => p.slicerDim.isEmpty && p.slicerParam.isEmpty).foreach { p =>
      val res = model.visual(graft.semantic.Visual(
        p.measures, p.groupBy.toSeq, filters = Seq(sel)))
      val key = p.groupBy
        .map(g => coalesce(col(g).cast("string"), lit("")))
        .getOrElse(lit(""))
      val expected = p.measures.flatMap { m =>
        res.select(key.as("grp"), col(m).cast("double").as("v")).collect()
          .map(r => (m, r.getString(0)) -> Option(r.get(1)))
      }.toMap
      val got = byAst(p.idx).map(r =>
        (r.getAs[String]("item"), r.getAs[String]("grp")) ->
          Option(r.get(r.fieldIndex("value_num")))).toMap
      assert(got.keySet == expected.keySet, s"ast ${p.idx} keys")
      got.foreach { case (k, v) =>
        assert(close(v, expected(k)), s"ast ${p.idx} $k: $v vs ${expected(k)}")
      }
      // the selection actually bites: fewer loans than unfiltered
      if (p.measures.contains("Loans") && p.groupBy.isEmpty) {
        val filtered = got(("Loans", "")).get.asInstanceOf[Double]
        assert(filtered > 0 && filtered < star.fact.count().toDouble)
      }
    }
    // slicers keep their FULL enumerations — the region slicer (ast 5)
    // still lists every region, not just the selected one
    val regionRows = byAst(5).map(_.getAs[String]("value_str")).toSet
    val allRegions = star.dimRegion.filter(col("is_current"))
      .select(col("region").cast("string")).distinct()
      .as[String].collect().toSet
    assert(regionRows == allRegions && allRegions.size > 1,
      "slicer enumeration must be unfiltered by its own selection")
  }

  test("q122/q131 serve from LANDED warehouse tables: no AST re-analyzes the build plan") {
    // VERDICT r12 §next-5: the serving boundary must be storage, not a
    // checkpointed build plan. Every star relation an AST touches must
    // be a parquet FILE SCAN (the landed table read back); a Window
    // anywhere in the serving plan means the SCD/fact build leaked into
    // AST compilation, and an RDD-scan leaf means serving still depends
    // on executor-storage checkpoints instead of the warehouse.
    import graft.plans.PlanWalk.walk
    Seq("q122_layout_replay", "q131_page_crossfilter").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect() // finalize AQE on THIS plan
      val nodes = walk(df.queryExecution.executedPlan)
      assert(nodes.exists(n =>
        n.getClass.getSimpleName.startsWith("FileSourceScan")),
        s"$q: expected parquet scans of the landed star tables")
      assert(!nodes.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
        s"$q: a Window in the serving plan — the build plan leaked into an AST")
      assert(!nodes.exists(_.getClass.getSimpleName == "RDDScanExec"),
        s"$q: an RDD-scan leaf — serving still reads checkpointed build output")
    }
  }
}
