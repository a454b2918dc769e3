package graft.warehouse

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Skew mitigation for joins whose key distribution is hot (SCALE.md).
  *
  * AQE's skew-join split handles sort-merge joins automatically; explicit
  * salting remains the tool when (a) the build side must be replicated
  * rather than broadcast (medium-sized dim, hot fact keys), or (b) the
  * engine runs without AQE. Mechanism: the skewed side gets a salt in
  * [0, n) varying WITHIN each key; the other side is replicated n times;
  * the join key becomes (key, salt). Result set is identical to the
  * unsalted join — only the shuffle distribution changes (each hot key
  * spreads over n reducers).
  */
object Skew {

  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 salt: Int): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    val s = skewed.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int"))
    val rep = other.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    s.join(rep, Seq(key, "__salt")).drop("__salt")
  }
}
