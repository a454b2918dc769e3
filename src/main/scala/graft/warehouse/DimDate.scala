package graft.warehouse

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Kimball calendar dimension generator (SURVEY.md §1.3 DimDate, §2.3 E8;
  * reference metadata `project SSIS!...loan_fact.dtsx:112` — the reference
  * never builds DimDate in-repo, it is populated by an out-of-repo script).
  *
  * Generated with `sequence` + `explode` from the observed date range of a
  * driving column — fully distributed, no driver loop. `date_sk` is the
  * conventional yyyymmdd integer key.
  */
object DimDate {

  /** Calendar spanning [min(dateCol), max(dateCol)] of `df`. */
  def fromRange(df: DataFrame, dateCol: String): DataFrame = {
    val bounds = df.agg(
      min(col(dateCol).cast("date")).as("lo"),
      max(col(dateCol).cast("date")).as("hi"))
    val days = bounds.select(
      explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("cal_date"))
    days.select(
      (year(col("cal_date")) * 10000 + month(col("cal_date")) * 100 +
        dayofmonth(col("cal_date"))).cast("int").as("date_sk"),
      col("cal_date"),
      dayofmonth(col("cal_date")).cast("int").as("day"),
      dayofweek(col("cal_date")).cast("int").as("day_of_week"),
      dayofyear(col("cal_date")).cast("int").as("day_of_year"),
      month(col("cal_date")).cast("int").as("month"),
      date_format(col("cal_date"), "MMMM").as("month_name"),
      quarter(col("cal_date")).cast("int").as("quarter"),
      concat(lit("Q"), quarter(col("cal_date")).cast("string")).as("quarter_name"),
      year(col("cal_date")).cast("int").as("year"))
  }
}
