package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shuffle-management patterns for cluster scale (SURVEY.md §4.4; task
  * brief: bucketing for co-located joins, salting for skew). These are
  * library surface — real pipelines call them — and their plan-level
  * guarantees are asserted in ScalePatternsSpec.
  */
object ScalePatterns {

  /** Write both sides as bucketed+sorted tables on the join key, then
    * join the tables: the plan contains NO Exchange — each bucket pair
    * joins co-located, which at 100 TB is the difference between a
    * terabyte-scale shuffle and none. Buckets must match in count and
    * key on both sides. */
  def bucketedCoLocatedJoin(s: SparkSession, left: DataFrame, right: DataFrame,
                            key: String, buckets: Int,
                            leftName: String, rightName: String): DataFrame = {
    left.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(leftName)
    right.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(rightName)
    s.table(leftName).join(s.table(rightName), key)
  }

  /** Two-phase salted aggregation for skewed keys: partial-aggregate on
    * (key, salt) — spreading a hot key over `saltFactor` reducers — then
    * final-aggregate on key. Result-identical to a direct groupBy-sum
    * for decomposable aggregates; the win is that no single reducer
    * receives a hot key's full volume.
    *
    * The salt is derived deterministically from row content (xxhash64 of
    * the value column), not rand(), so results are reproducible and
    * retries are safe. */
  def saltedSumBy(df: DataFrame, key: String, valueCol: String,
                  saltFactor: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(col(valueCol)), lit(saltFactor)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"), count(lit(1)).as("__n"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("sum_value"),
           sum(col("__n")).as("n_rows"))
}
