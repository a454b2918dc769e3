package graft.ibrd

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Deterministic IBRD-shaped fixture (FIXTURES.md §1–§2): ~220 raw API rows
  * spanning 3 `end_of_period` snapshots (2 kept, 1 filtered), with nulls in
  * borrower/guarantor/project_name_, at least one unmatched dictionary key,
  * and within-batch duplicate loan rows.
  *
  * Everything is index-derived — no randomness — so golden counts in
  * IbrdSpec are stable. The recode dictionaries reproduce the documented
  * *mechanism* and representative entries (FIXTURES.md §2), including the
  * reference's literal typo key `uzbakistan`; the politically-motivated
  * country rename present in the reference is deliberately omitted
  * (identity mapping), per FIXTURES.md.
  */
object Fixture {

  // ---- recode dictionaries (lower-cased keys and values, as after E1) ----
  val statusCleaning: Map[String, String] = Map(
    "repaid" -> "fully repaid",
    "cancelled" -> "fully cancelled",
    "disbursed" -> "fully disbursed")

  val loanStatusBk: Map[String, Int] = Map(
    "disbursing" -> 0, "disbursing&repaying" -> 1, "effective" -> 2,
    "fully cancelled" -> 3, "fully disbursed" -> 4, "fully repaid" -> 5,
    "fully transferred" -> 6, "signed" -> 7, "terminated" -> 8)

  val typeCleaning: Map[String, String] = Map(
    "scp eur" -> "scp", "scp jpy" -> "scp", "scp usd" -> "scp",
    "npl" -> "non pool")

  val loanTypeBk: Map[String, Int] = Map(
    "cpl" -> 0, "fsl" -> 1, "non pool" -> 2, "pool loan" -> 3, "scl" -> 4,
    "scp" -> 5, "scpd" -> 6, "scpm" -> 7, "sngl crncy" -> 8)

  val countriesCleaning: Map[String, String] = Map(
    "turkiye" -> "turkey",
    "macedonia, former yugoslav republic" -> "macedonia",
    "north macedonia" -> "macedonia",
    "czechia" -> "czech republic",
    "viet nam" -> "vietnam",
    "israel" -> "israel") // identity — vandalism entry deliberately omitted

  val regionsCleaning: Map[String, String] = Map(
    "africa east" -> "africa", "africa west" -> "africa",
    "east asia and pacific" -> "asia", "south asia" -> "asia",
    "eastern and southern africa" -> "africa",
    "western and central africa" -> "africa",
    "europe and central asia" -> "europe and central asia",
    "latin america and caribbean" -> "latin america and caribbean",
    "middle east and north africa" -> "middle east and north africa")

  val regionsBk: Map[String, Int] = Map(
    "africa" -> 0, "asia" -> 1, "europe" -> 2,
    "latin america and caribbean" -> 3, "middle east" -> 4,
    "europe and central asia" -> 5, "middle east and north africa" -> 6)

  // canonical borrower per country (E3), incl. the reference's typo key
  val borrowerCleaning: Map[String, String] = Map(
    "albania" -> "ministry of finance",
    "india" -> "controller of aid accounts & audit",
    "turkey" -> "ministry of treasury and finance",
    "vietnam" -> "ministry of finance",
    "uzbakistan" -> "ministry of finance of uzbekistan",
    "brazil" -> "ministerio da fazenda")

  val countryBk: Map[String, Int] = Map(
    "albania" -> 0, "brazil" -> 1, "czech republic" -> 2, "india" -> 3,
    "israel" -> 4, "japan" -> 5, "macedonia" -> 6, "turkey" -> 7,
    "vietnam" -> 8, "uzbakistan" -> 9, "not_specified" -> -1)
  // NOTE: 'atlantis' (fixture row 130) is deliberately absent → null BK

  val borrowerBk: Map[String, Int] = Map(
    "ministry of finance" -> 0,
    "controller of aid accounts & audit" -> 1,
    "ministry of treasury and finance" -> 2,
    "ministry of finance of uzbekistan" -> 3,
    "ministerio da fazenda" -> 4,
    "borrower alpha" -> 5, "borrower beta" -> 6, "borrower gamma" -> 7,
    "not_specified" -> -1)

  val allDicts: Map[String, Map[String, String]] = Map(
    "Status_Cleaning" -> statusCleaning,
    "loan_status_BK" -> loanStatusBk.map { case (k, v) => k -> v.toString },
    "Type_Cleaning" -> typeCleaning,
    "loan_type_BK" -> loanTypeBk.map { case (k, v) => k -> v.toString },
    "Countries_Cleaning" -> countriesCleaning,
    "Regions_Cleaning" -> regionsCleaning,
    "regions_BK" -> regionsBk.map { case (k, v) => k -> v.toString },
    "Borrower_cleaning" -> borrowerCleaning,
    "country_BK" -> countryBk.map { case (k, v) => k -> v.toString },
    "borrower_BK_updated" -> borrowerBk.map { case (k, v) => k -> v.toString })

  // ---- raw rows ----
  private val countriesRaw = Vector(
    "Turkiye", "Viet Nam", "INDIA", "Israel", "Albania", "Czechia",
    "North Macedonia", "Brazil", "Japan", "uzbakistan")
  private val regionsRaw = Vector(
    "Africa East", "South Asia", "EUROPE AND CENTRAL ASIA",
    "Latin America and Caribbean", "Middle East and North Africa",
    "Western and Central Africa")
  private val statusesRaw = Vector(
    "Repaid", "Cancelled", "Disbursed", "Effective", "Signed", "Disbursing")
  private val typesRaw = Vector(
    "SCP EUR", "NPL", "FSL", "Pool Loan", "SCP USD", "CPL")
  private val snapshots = Vector("30-Jun-2024", "30-Jun-2023", "31-Dec-2020")
  private val borrowersRaw = Vector("Borrower Alpha", "Borrower Beta", "Borrower Gamma")

  def nRows: Int = 220

  /** Raw API page as Rows under [[Model.rawSchema]]. */
  def rawRows: Seq[Row] = (0 until nRows).map { i =>
    val country = if (i == 130) "Atlantis" else countriesRaw(i % countriesRaw.size)
    val mmm = Vector("Jan", "Mar", "Jun", "Sep", "Nov")(i % 5)
    // cycle index de-correlated from the snapshot modulus (i % 3), so every
    // dictionary value survives the snapshot filter (stride shift i/3)
    val j = i + i / 3
    Row(
      snapshots(i % 3), // end_of_period
      f"L${i % 200}%04d", // loan_number (dup pair: i and i+200 share number)
      // region is a FUNCTION of the country (real-world snowflake shape;
      // a non-functional mapping made every country's region FK collapse
      // to min(SK) under dedup)
      regionsRaw((i % countriesRaw.size) % regionsRaw.size),
      s"C${i % countriesRaw.size}", // country_code
      country,
      if (i % 7 == 0) null else borrowersRaw(j % borrowersRaw.size),
      s"G${i % 4}", // guarantor_country_code
      if (i % 11 == 0) null else countriesRaw((i + 3) % countriesRaw.size),
      typesRaw(j % typesRaw.size),
      statusesRaw(j % statusesRaw.size),
      "USD", // currency_of_commitment (dropped)
      f"P${i % 50}%03d", // project_id
      if (i % 5 == 0) s"Project ${i % 50}" else null, // project_name_ (sparse)
      "01-Jan-2000", "01-Feb-2000", "01-Mar-2000", // signing/effective/last_disb
      s"15-$mmm-${1995 + i % 20}", // first_repayment_date
      s"15-$mmm-${2010 + i % 15}", // last_repayment_date
      s"0${1 + i % 9}-$mmm-${1990 + i % 30}", // board_approval_date
      "31-Dec-2024", // closed_date_most_recent
      0.5 + (i % 80) * 0.1, // interest_rate
      1.0e6 + i * 1000.0, // original_principal_amount
      (i % 10) * 500.0, // cancelled_amount
      (i % 7) * 300.0, // undisbursed_amount
      9.0e5 + i * 900.0, // disbursed_amount
      (i % 13) * 100.0, // repaid_to_ibrd
      (i % 17) * 50.0, // due_to_ibrd
      0.0, // exchange_adjustment
      5.0e5 + i * 10.0, // borrowers_obligation
      0.0, // sold_3rd_party
      (i % 3) * 25.0, // repaid_3rd_party
      (i % 5) * 12.0, // due_3rd_party
      1.0e5) // loans_held
  }

  def raw(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rawRows, 4), Model.rawSchema)
}
