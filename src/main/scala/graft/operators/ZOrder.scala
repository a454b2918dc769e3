package graft.operators

import graft.{Q, QueryPack, Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the multi-dimensional clustering
  * technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`: interleave the
  * bits of per-column rank buckets so rows close in BOTH dimensions land
  * close on the curve, then range-partition + sort the table by the
  * interleaved key. Parquet min/max footer stats per file/row-group then
  * prune multi-dimensional box predicates, where a single-column sort
  * only ever prunes its own column.
  *
  * At 100 TB this is a LAYOUT decision, not a query: one
  * `repartitionByRange(zkey)` shuffle at write time (sampling-based range
  * boundaries — the same mechanism production optimizers use) buys every
  * subsequent box query file-level skipping on all z-ordered dimensions.
  * The bucket bounds come from a broadcast one-row min/max aggregate —
  * no driver collect, no second scan ordering dependency.
  *
  * Everything is exact integer arithmetic (bucket = (v-min)·2^bits DIV
  * (max-min+1); Morton interleave is shifts and masks), so the catalog
  * entry's per-cell histogram is replayed bit-for-bit by the DuckDB
  * oracle. The measured pruning win lives in ZOrderSpec +
  * tools/ProfileZOrder (SCALE.md §layout).
  */
object ZOrder extends QueryPack {

  /** Bits per dimension for the catalog entry (2^8 buckets per dim). */
  val Bits = 8

  /** Z-cell shift for the histogram output: zkey >> 6 → ≤ 2^10 cells. */
  val CellShift = 6

  /** Morton interleave of two bucket ids (each < 2^bits): x-bit j lands
    * at position 2j+1, y-bit j at 2j. Pure shifts/masks — whole-stage
    * codegen keeps the fold in one generated expression. */
  def interleave(xb: Column, yb: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, j) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xb, j).bitwiseAND(lit(1L)), 2 * j + 1))
        .bitwiseOR(shiftleft(shiftright(yb, j).bitwiseAND(lit(1L)), 2 * j))
    }

  /** The oracle-side rendering of [[interleave]] over columns `xb`/`yb` —
    * generated from the same loop so the two can't drift. */
  def interleaveSql(bits: Int): String =
    (0 until bits).map { j =>
      s"((((xb >> $j) & 1) << ${2 * j + 1}) | (((yb >> $j) & 1) << ${2 * j}))"
    }.mkString(" | ")

  /** Add (xb, yb, zkey) for two integral columns: linear min/max buckets
    * (broadcast one-row bounds, integer DIV — max maps to bucket 2^bits-1
    * by construction) + Morton interleave. */
  def withZKey(df: DataFrame, xCol: String, yCol: String,
               bits: Int = Bits): DataFrame = {
    val mm = df.agg(
      min(col(xCol)).as("mn_x"), max(col(xCol)).as("mx_x"),
      min(col(yCol)).as("mn_y"), max(col(yCol)).as("mx_y"))
    val p = 1L << bits
    df.crossJoin(broadcast(mm))
      .withColumn("xb", expr(s"(($xCol - mn_x) * $p) DIV (mx_x - mn_x + 1)"))
      .withColumn("yb", expr(s"(($yCol - mn_y) * $p) DIV (mx_y - mn_y + 1)"))
      .withColumn("zkey", interleave(col("xb"), col("yb"), bits))
      .drop("mn_x", "mx_x", "mn_y", "mx_y")
  }

  /** Write `df` clustered on `sortCol` into `nFiles` range-partitioned,
    * internally sorted parquet files — the layout step. One shuffle
    * (sampled range boundaries), then a local sort per output file. */
  def writeClustered(df: DataFrame, sortCol: String, path: String,
                     nFiles: Int): Unit =
    df.repartitionByRange(nFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(path)

  /** Per-file min/max of `cols` for a written layout — exactly the stats
    * parquet footer pruning consults. One column-pruned scan. */
  def fileRangeStats(spark: SparkSession, path: String,
                     cols: Seq[String]): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(cols.flatMap(c => Seq(min(col(c)).as(s"${c}_min"),
        max(col(c)).as(s"${c}_max"))).head,
        cols.flatMap(c => Seq(min(col(c)).as(s"${c}_min"),
          max(col(c)).as(s"${c}_max"))).tail: _*)

  /** How many files of a layout a 2-D box predicate must touch, judged by
    * the same min/max overlap test file skipping performs. */
  def filesTouched(stats: DataFrame, xCol: String, xLo: Long, xHi: Long,
                   yCol: String, yLo: Long, yHi: Long): Long =
    stats.filter(
      col(s"${xCol}_min") <= xHi && col(s"${xCol}_max") >= xLo &&
      col(s"${yCol}_min") <= yHi && col(s"${yCol}_max") >= yLo).count()

  // ---- Hilbert curve (q152): the seam-free upgrade over Morton ----
  // A box astride the domain midpoint is Morton's worst case (the curve
  // jumps across the quadrant seam); the Hilbert curve is CONTINUOUS —
  // consecutive d-indices are always grid neighbors — so file z-ranges
  // cover compact regions with no seam to straddle. The classic xy2d
  // walk (quadrant digit + rotate/flip, full-side n-1 reflection) is
  // unrolled into bits chained column projections; Catalyst collapses
  // them into one whole-stage-codegen'd expression per row.

  /** Driver-side reference xy2d — the spec's ground truth, validated by
    * the continuity property (successive d ⇒ grid neighbors). */
  def hilbertRef(bits: Int, x0: Long, y0: Long): Long = {
    val n = 1L << bits
    var x = x0; var y = y0; var d = 0L
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Append `hkey` (Hilbert d-index of (xb, yb)) to a bucketed frame.
    * One chained projection per bit level — same per-level updates as
    * [[hilbertRef]], so the three renderings (Scala, Column, SQL) are
    * the same loop. */
  def withHilbertKey(df: DataFrame, bits: Int = Bits): DataFrame = {
    val n1 = (1L << bits) - 1
    var cur = df.withColumn("hx", col("xb")).withColumn("hy", col("yb"))
      .withColumn("hd", lit(0L))
    for (i <- (bits - 1) to 0 by -1) {
      val s = 1L << i
      val rx = when(col("hx").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
      val ry = when(col("hy").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
      cur = cur
        .withColumn("hd2",
          col("hd") + lit(s * s) * (lit(3L) * rx).bitwiseXOR(ry))
        .withColumn("hx2", when(ry === 1, col("hx"))
          .otherwise(when(rx === 1, lit(n1) - col("hy")).otherwise(col("hy"))))
        .withColumn("hy2", when(ry === 1, col("hy"))
          .otherwise(when(rx === 1, lit(n1) - col("hx")).otherwise(col("hx"))))
        .drop("hd", "hx", "hy")
        .withColumnRenamed("hd2", "hd")
        .withColumnRenamed("hx2", "hx")
        .withColumnRenamed("hy2", "hy")
    }
    cur.withColumnRenamed("hd", "hkey").drop("hx", "hy")
  }

  /** Oracle-side rendering of [[withHilbertKey]]: one CTE per bit level,
    * generated from the same loop. Expects a CTE named `hb` providing
    * (xb, yb, hx, hy, hd); yields CTEs h1..h`bits` where h`bits` holds
    * the final `hd`. */
  def hilbertSql(bits: Int): String = {
    val n1 = (1L << bits) - 1
    ((bits - 1) to 0 by -1).zipWithIndex.map { case (i, step) =>
      val s = 1L << i
      val prev = if (step == 0) "hb" else s"h$step"
      s""",
        h${step + 1} AS (
          SELECT xb, yb,
                 hd + ${s * s} *
                   xor(3 * (CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END),
                       (CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END)) AS hd,
                 CASE WHEN (hy & $s) > 0 THEN hx
                      WHEN (hx & $s) > 0 THEN $n1 - hy
                      ELSE hy END AS hx,
                 CASE WHEN (hy & $s) > 0 THEN hy
                      WHEN (hx & $s) > 0 THEN $n1 - hx
                      ELSE hx END AS hy
          FROM $prev
        )"""
    }.mkString
  }

  def queries: Map[String, Q] = Map(
    // Per-z-cell histogram over lineitem (l_orderkey × l_partkey): the
    // cell id exercises every bit of the interleave per row, and the
    // per-cell bucket min/max EXHIBIT the locality the layout buys
    // (tight ranges per cell) in an exactly-oracled output.
    "q150_zorder_cells" -> Q(
      (s, d) => {
        val z = withZKey(
          T.lineitem(s, d).select(col("l_orderkey"), col("l_partkey")),
          "l_orderkey", "l_partkey")
        z.groupBy(shiftright(col("zkey"), CellShift).as("zcell"))
          .agg(count(lit(1)).as("n"),
            min(col("xb")).as("xb_min"), max(col("xb")).as("xb_max"),
            min(col("yb")).as("yb_min"), max(col("yb")).as("yb_max"))
      },
      Some(s"""
        WITH mm AS (
          SELECT min(l_orderkey) AS mn_x, max(l_orderkey) AS mx_x,
                 min(l_partkey) AS mn_y, max(l_partkey) AS mx_y
          FROM lineitem
        ),
        b AS (
          SELECT ((l_orderkey - mn_x) * ${1L << Bits}) // (mx_x - mn_x + 1)
                   AS xb,
                 ((l_partkey - mn_y) * ${1L << Bits}) // (mx_y - mn_y + 1)
                   AS yb
          FROM lineitem CROSS JOIN mm
        ),
        z AS (SELECT xb, yb, ${interleaveSql(Bits)} AS zkey FROM b)
        SELECT zkey >> $CellShift AS zcell, count(*) AS n,
               min(xb) AS xb_min, max(xb) AS xb_max,
               min(yb) AS yb_min, max(yb) AS yb_max
        FROM z GROUP BY 1
      """.stripMargin),
      doc = "Z-order/Morton layout key: broadcast min/max buckets + bit " +
        "interleave; per-cell histogram oracled bit-for-bit"),

    // Hilbert d-index over the same buckets: the seam-free layout key.
    // Same histogram shape as q150 so the two curves' locality is
    // directly comparable cell-by-cell; ProfileZOrder prices the actual
    // file-skipping of linear vs Morton vs Hilbert (SCALE.md §layout).
    "q152_hilbert_cells" -> Q(
      (s, d) => {
        val z = withHilbertKey(withZKey(
          T.lineitem(s, d).select(col("l_orderkey"), col("l_partkey")),
          "l_orderkey", "l_partkey"))
        z.groupBy(shiftright(col("hkey"), CellShift).as("hcell"))
          .agg(count(lit(1)).as("n"),
            min(col("xb")).as("xb_min"), max(col("xb")).as("xb_max"),
            min(col("yb")).as("yb_min"), max(col("yb")).as("yb_max"))
      },
      Some(s"""
        WITH mm AS (
          SELECT min(l_orderkey) AS mn_x, max(l_orderkey) AS mx_x,
                 min(l_partkey) AS mn_y, max(l_partkey) AS mx_y
          FROM lineitem
        ),
        b AS (
          SELECT ((l_orderkey - mn_x) * ${1L << Bits}) // (mx_x - mn_x + 1)
                   AS xb,
                 ((l_partkey - mn_y) * ${1L << Bits}) // (mx_y - mn_y + 1)
                   AS yb
          FROM lineitem CROSS JOIN mm
        ),
        hb AS (
          SELECT xb, yb, xb AS hx, yb AS hy, CAST(0 AS BIGINT) AS hd FROM b
        )${hilbertSql(Bits)}
        SELECT hd >> $CellShift AS hcell, count(*) AS n,
               min(xb) AS xb_min, max(xb) AS xb_max,
               min(yb) AS yb_min, max(yb) AS yb_max
        FROM h$Bits GROUP BY 1
      """.stripMargin),
      doc = "Hilbert-curve layout key: per-level rotate/flip unrolled to " +
        "chained projections; histogram oracled bit-for-bit")
  )
}
