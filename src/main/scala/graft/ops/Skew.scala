package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter keys.
  *
  * AQE's skew-join handling (on by default in our sessions) covers joins;
  * this covers skewed AGGREGATIONS: a two-stage salted aggregate — partial
  * aggregate on (key, salt), final aggregate on key — so a single hot key
  * fans across `saltFactor` reducers instead of one. The decomposition works
  * for any algebraic aggregate (sum/count/min/max, and avg via sum+count).
  */
object Skew {

  /** Salted sum/count aggregate: `df.groupBy(key).agg(sum(valueCol), count)`
    * computed skew-safely. Exact decimal sums keep the result identical to
    * the direct aggregate regardless of salt partitioning.
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      saltFactor: Int = 16, scale: Int = 2): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltFactor)))
    val partial = salted
      .groupBy(col(key), col("__salt"))
      .agg(
        sum(col(valueCol).cast(s"decimal(28,$scale)")).as("__psum"),
        count(lit(1)).as("__pcnt"))
    partial.groupBy(col(key))
      .agg(
        sum(col("__psum")).cast("double").as("sum_value"),
        sum(col("__pcnt")).as("cnt"))
  }

  /** Salt one side of a join against a replicated small-ish skewed side:
    * big.withSalt joins small.explodeSalt on (key, salt). Use when AQE can't
    * see the skew (e.g. pre-shuffle aggregation states).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int = 16): DataFrame = {
    val bigSalted = big.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltFactor)))
    val smallExploded = small.withColumn("__salt",
      explode(sequence(lit(0L), lit((saltFactor - 1).toLong))))
    bigSalted.join(smallExploded, Seq(key, "__salt")).drop("__salt")
  }
}
