package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch: scale rehearsal of the graph tier (q153 PageRank, q156
  * random-walk pairs). The claim — "the edge table is static; per-round
  * cost is RANK-sized (8 B × n), so 10× nodes ⇒ ~10× shuffle, no
  * super-linear term" — measured at two operating points:
  *
  *   base — sf0.1 documents (5k nodes, 20k edges)
  *   x10  — ten id-shifted copies (50k nodes, 200k edges)
  *
  * Reports wall + shuffle bytes (TaskEnd listener, not estimates) for the
  * full 3-round PageRank and the WalkLen-step walk corpus at each point.
  * Not product surface. */
object ProfileGraph {

  private class Acc extends SparkListener {
    @volatile var read = 0L
    @volatile var spilled = 0L
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        read += m.shuffleReadMetrics.totalBytesRead
        spilled += m.diskBytesSpilled
      }
    }
    def reset(): Unit = { read = 0L; spilled = 0L }
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)

    val docs0 = graft.Tables.documents(spark, base).select("doc_id")
    val maxId = docs0.agg(max(col("doc_id"))).head().getLong(0) + 1
    def docsX(n: Int): DataFrame =
      (0 until n).map(k => docs0.withColumn("doc_id",
        col("doc_id") + lit(k * maxId))).reduce(_.unionByName(_))

    def run(label: String, op: String, docs: DataFrame,
            f: DataFrame => DataFrame): Unit = {
      spark.catalog.clearCache(); System.gc()
      val walls = (1 to 2).map { _ =>
        acc.reset()
        val t0 = System.nanoTime()
        f(docs).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"tool":"graph","op":"$op","point":"$label",""" +
        f""""wall_sec":${walls.min}%.2f,""" +
        f""""shuffle_read_mb":${acc.read / 1048576.0}%.1f,""" +
        f""""spill_mb":${acc.spilled / 1048576.0}%.1f}""")
    }

    run("base_1x", "pagerank", docsX(1),
      d => graft.operators.Graph.pagerank(spark, d))
    run("nodes_10x", "pagerank", docsX(10),
      d => graft.operators.Graph.pagerank(spark, d))
    run("base_1x", "randwalk", docsX(1),
      d => graft.operators.Graph.skipgramPairs(spark, d))
    run("nodes_10x", "randwalk", docsX(10),
      d => graft.operators.Graph.skipgramPairs(spark, d))
    run("base_1x", "triangles", docsX(1),
      d => graft.operators.Graph.triangleCounts(spark, d))
    run("nodes_10x", "triangles", docsX(10),
      d => graft.operators.Graph.triangleCounts(spark, d))

    // ---- planted hub: the skew case the near-regular derived graph
    // cannot exercise. One node of degree k at a MID id (the id-
    // orientation worst case), star + spoke ring. Measures the wedge
    // ROW COUNT — the quantity (degree, id) orientation exists to
    // bound — under both orientations.
    def hubUnd(k: Int): DataFrame = {
      val hub = (k / 2).toLong
      val sp = spark.range(k + 1).filter(col("id") =!= hub)
        .select(col("id").as("s"))
      val star = sp.select(least(col("s"), lit(hub)).as("a"),
        greatest(col("s"), lit(hub)).as("b"))
      def spoke(x: org.apache.spark.sql.Column) =
        when(x < hub, x).otherwise(x + 1)
      val ring = spark.range(k - 1).select(
        least(spoke(col("id")), spoke(col("id") + 1)).as("a"),
        greatest(spoke(col("id")), spoke(col("id") + 1)).as("b"))
      star.unionByName(ring).distinct()
    }
    Seq(2000, 20000).foreach { k =>
      val und = hubUnd(k).localCheckpoint()
      val byDeg = graft.operators.Graph
        .orientedWedges(graft.operators.Graph.orientByDegree(und)).count()
      val byId = und.alias("e1")
        .join(und.alias("e2"), col("e1.b") === col("e2.a")).count()
      println(s"""{"tool":"graph","op":"planted_hub","k":$k,""" +
        s""""wedges_degree_oriented":$byDeg,"wedges_id_oriented":$byId}""")
    }
  }
}
