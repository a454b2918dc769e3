package graft.semantic

import graft.ibrd.{IbrdMeasures, IbrdWarehouse}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Exhaustive replay of the reference dashboard's query surface: ALL 27
  * distinct `prototypeQuery` ASTs across the report's 5 light pages
  * (`Loans Dashboard.pbix!Report/Layout`, 177 visual containers — the 5
  * dark pages duplicate the light pages' ASTs, and non-data visuals
  * carry no query), transcribed one-to-one below and compiled through
  * the semantic layer over the IBRD star.
  *
  * Earlier rounds sampled this surface (~14 representative visuals,
  * q30–q39/q70–q73); this module is the completeness proof: every AST
  * the reference report can issue compiles and its result is oracled
  * (q122, one consolidated long-format entry — see
  * [[graft.operators.Ibrd]]).
  *
  * AST kinds observed in the Layout and how each compiles:
  *  - measure visuals (card / clusteredColumn / clusteredBar / line):
  *    `SemanticModel.visual` — measures × ≤1 grouping attribute, OrderBy
  *    by measure (Direction 2 = desc) or by the attribute (1 = asc);
  *  - field slicers over a dimension attribute (region, country, Date,
  *    Year): the dim relation's distinct attribute values — a slicer's
  *    query reads only its source entity (`From` has one entry);
  *  - field-parameter slicers (the 3 Prm* tables): the parameter's
  *    declared option list ([[SemanticModel.parameter]]) — the reference
  *    stores these rows in the Vertipaq blob; selections feed
  *    `visual(selections = ...)` (exercised by q35–q37).
  *
  * Ordering is part of each AST (and kept in the transcription for
  * fidelity) but the consolidated replay output is a SET — the
  * correctness gate compares row-sorted, so OrderBy carries no
  * information there; ORDER-sensitive compilation itself is covered by
  * q70/q31's ordered visuals.
  */
object Layout {

  /** One distinct `prototypeQuery`. `measures` are `_Measures`
    * properties; `groupBy` is the expanded-model column for the AST's
    * dimension attribute / hierarchy level; slicer ASTs set `slicerDim`
    * (entity attribute enumeration) or `slicerParam` instead. */
  final case class Proto(
      idx: Int,
      page: String,
      visualType: String,
      measures: Seq[String] = Nil,
      groupBy: Option[String] = None,
      orderByMeasureDesc: Boolean = false,
      slicerDim: Option[(String, String)] = None, // (entity, model column)
      slicerParam: Option[String] = None)

  // Reference attribute → expanded-model column: Dimension_Borrower's
  // `borrower_name` is this star's `borrower`; DimDate's hierarchy Year
  // is the date relationship's `period_year`, its raw `Date` column is
  // `period_date` (the lower-cased dd-MMM-yyyy string the staging layer
  // carries end-to-end, SURVEY §1.2).
  /** The 27 distinct ASTs, in Layout order of first appearance.
    * Page abbreviations: LPO = Loan Portfolio Overview, LSP = Loan
    * Status & Performance, LTI = Loan Type & Interest Analysis,
    * GBA = Guarantor & Borrower Analysis. */
  val all: Seq[Proto] = Seq(
    Proto(0, "LPO", "cardVisual",
      measures = Seq("Loans", "Loan Amount", "Repaid", "Due1"),
      orderByMeasureDesc = true),
    Proto(1, "LPO", "slicer", slicerParam = Some("PrmStatus&Type")),
    Proto(2, "LPO", "clusteredColumnChart",
      measures = Seq("Loans"), groupBy = Some("loan_status"),
      orderByMeasureDesc = true),
    Proto(3, "LPO", "slicer", slicerParam = Some("PrmAmount&Repiad&Due")),
    Proto(4, "LPO", "slicer",
      slicerDim = Some(("DimDate.Date Hierarchy", "period_year"))),
    Proto(5, "LPO", "slicer",
      slicerDim = Some(("Dimension_Region", "region"))),
    Proto(6, "LPO", "slicer",
      slicerDim = Some(("Dimension_Country", "country"))),
    Proto(7, "LPO", "lineChart",
      measures = Seq("Loan Amount"), groupBy = Some("period_year")),
    Proto(8, "LPO Dark", "lineChart",
      measures = Seq("Loan Amount"), groupBy = Some("period_date")),
    Proto(9, "LPO Dark", "slicer",
      slicerDim = Some(("DimDate", "period_date"))),
    Proto(10, "LSP", "clusteredColumnChart",
      measures = Seq("Disbursed Amount"), groupBy = Some("loan_status"),
      orderByMeasureDesc = true),
    Proto(11, "LSP", "cardVisual",
      measures = Seq("Undisbursed Amount", "Disbursed Amount"),
      orderByMeasureDesc = true),
    Proto(12, "LSP", "clusteredColumnChart",
      measures = Seq("Loans"), groupBy = Some("loan_status"),
      orderByMeasureDesc = true),
    Proto(13, "LSP", "clusteredColumnChart",
      measures = Seq("Loan Amount"), groupBy = Some("loan_status"),
      orderByMeasureDesc = true),
    Proto(14, "LTI", "clusteredColumnChart",
      measures = Seq("Average Inerest Rate"), groupBy = Some("loan_type"),
      orderByMeasureDesc = true),
    Proto(15, "LTI", "clusteredColumnChart",
      measures = Seq("Loans"), groupBy = Some("loan_type"),
      orderByMeasureDesc = true),
    Proto(16, "LTI", "clusteredColumnChart",
      measures = Seq("Interest Income"), groupBy = Some("loan_type"),
      orderByMeasureDesc = true),
    Proto(17, "LTI", "clusteredColumnChart",
      measures = Seq("Loan Amount"), groupBy = Some("loan_type"),
      orderByMeasureDesc = true),
    Proto(18, "GBA", "slicer", slicerParam = Some("PrmDorrower&Guarantor")),
    Proto(19, "GBA", "cardVisual",
      measures = Seq("Guarantors", "Borrowers"), orderByMeasureDesc = true),
    Proto(20, "GBA", "clusteredBarChart",
      measures = Seq("Disbursed Amount"), groupBy = Some("borrower"),
      orderByMeasureDesc = true),
    Proto(21, "GBA", "clusteredBarChart",
      measures = Seq("Loan Amount"), groupBy = Some("borrower"),
      orderByMeasureDesc = true),
    Proto(22, "GBA", "clusteredBarChart",
      measures = Seq("Loans"), groupBy = Some("borrower"),
      orderByMeasureDesc = true),
    Proto(23, "GBA", "clusteredBarChart",
      measures = Seq("Disbursed Amount"), groupBy = Some("guarantor"),
      orderByMeasureDesc = true),
    Proto(24, "GBA Dark", "clusteredBarChart",
      measures = Seq("Disbursed Amount"), groupBy = Some("guarantor"),
      orderByMeasureDesc = true),
    Proto(25, "GBA Dark", "clusteredBarChart",
      measures = Seq("Loan Amount"), groupBy = Some("guarantor"),
      orderByMeasureDesc = true),
    Proto(26, "GBA Dark", "clusteredBarChart",
      measures = Seq("Loans"), groupBy = Some("guarantor"),
      orderByMeasureDesc = true))

  /** Compile ONE AST over the star. Data visuals run through
    * `SemanticModel.visual` (with the AST's ordering); slicers enumerate
    * their source relation / parameter options. */
  def compile(star: IbrdWarehouse.Star, p: Proto): DataFrame = {
    val model = IbrdMeasures.model(star)
    (p.slicerDim, p.slicerParam) match {
      case (Some((_, column)), _) =>
        slicerSource(star, column).select(col(column).cast("string").as(column))
          .distinct().orderBy(col(column).asc)
      case (_, Some(param)) =>
        val s = star.fact.sparkSession
        import s.implicits._
        model.parameter(param).options.toDF("option")
      case _ =>
        model.visual(Visual(
          measures = p.measures,
          groupBy = p.groupBy.toSeq,
          orderBy =
            if (p.orderByMeasureDesc) Seq(col(p.measures.head).desc)
            else p.groupBy.map(col(_).asc).toSeq))
    }
  }

  /** A slicer's `From` names one entity; its values come from that dim
    * relation (current rows for SCD dims, the calendar for DimDate). */
  private def slicerSource(star: IbrdWarehouse.Star, column: String): DataFrame =
    column match {
      case "region" => star.dimRegion.filter(col("is_current"))
      case "country" => star.dimCountry.filter(col("is_current"))
      case "period_year" => star.dimDate.select(col("year").as("period_year"))
      case "period_date" => star.dimDate.select(col("Date").as("period_date"))
      case other => sys.error(s"no slicer source for '$other'")
    }

  /** The consolidated replay: every AST compiled, each result unpivoted
    * to one long schema and unioned —
    * `(ast, item, grp, value_num, value_str)` where `item` is the
    * measure / attribute / parameter name, `grp` the grouping value (''
    * for cards), `value_num` the measure value and `value_str` the
    * enumerated slicer value. One row of this output is one data point
    * some visual on the reference dashboard renders. */
  def replay(star: IbrdWarehouse.Star): DataFrame =
    frames(star, IbrdMeasures.model(star), all).reduce(_.unionByName(_))

  /** Cross-filter interaction replay (VERDICT r10 §next-8): a slicer
    * SELECTION applied PAGE-WIDE — every data visual of `page`
    * re-evaluated under `selection`, compiled through ONE
    * [[SemanticModel.crossFiltered]] model (the filter is declared once
    * and reaches each visual through the shared expanded table, the
    * Power BI interaction contract). Slicer visuals still enumerate
    * their full declared sources: PBI's default interaction leaves a
    * slicer's own item list unfiltered by selections (its own or other
    * slicers') — only data visuals cross-filter. */
  def replayPage(star: IbrdWarehouse.Star, page: String,
                 selection: org.apache.spark.sql.Column,
                 base: IbrdWarehouse.Star => SemanticModel =
                   IbrdMeasures.model): DataFrame =
    frames(star, base(star).crossFiltered(selection),
      all.filter(_.page == page)).reduce(_.unionByName(_))

  /** One long-format frame per AST: data visuals compile through
    * `model` (which may carry page filters); slicers enumerate from the
    * UNFILTERED star/parameter tables. */
  private def frames(star: IbrdWarehouse.Star, model: SemanticModel,
                     protos: Seq[Proto]): Seq[DataFrame] = {
    require(protos.nonEmpty, "no ASTs to replay")
    val nullNum = lit(null).cast("double")
    val nullStr = lit(null).cast("string")
    protos.map { p =>
      (p.slicerDim, p.slicerParam) match {
        case (Some((_, column)), _) =>
          slicerSource(star, column)
            .select(col(column).cast("string").as("v")).distinct()
            .select(lit(p.idx).as("ast"), lit(column).as("item"),
              col("v").as("grp"), nullNum.as("value_num"),
              col("v").as("value_str"))
        case (_, Some(param)) =>
          val s = star.fact.sparkSession
          import s.implicits._
          model.parameter(param).options.toDF("v")
            .select(lit(p.idx).as("ast"), lit(param).as("item"),
              col("v").as("grp"), nullNum.as("value_num"),
              col("v").as("value_str"))
        case _ =>
          // un-ordered visual: the long format is set-compared
          val res = model.visual(Visual(p.measures, p.groupBy.toSeq))
          val key = p.groupBy
            .map(g => coalesce(col(g).cast("string"), lit("")))
            .getOrElse(lit(""))
          p.measures.map { m =>
            res.select(lit(p.idx).as("ast"), lit(m).as("item"),
              key.as("grp"), col(m).cast("double").as("value_num"),
              nullStr.as("value_str"))
          }.reduce(_.unionByName(_))
      }
    }
  }
}
