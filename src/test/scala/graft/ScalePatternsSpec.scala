package graft

import graft.operators.ScalePatterns
import org.apache.spark.sql.functions._

/** Plan-level and result-level guarantees of the scale patterns. */
class ScalePatternsSpec extends SparkSpecBase {

  test("bucketed co-located join plans with no shuffle exchange") {
    val orders = Tables.orders(spark, sfSmoke)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables.lineitem(spark, sfSmoke)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    // disable auto-broadcast: at real scale neither side broadcasts, and
    // the point is the shuffle-free sort-merge join over matching buckets
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = ScalePatterns.bucketedCoLocatedJoin(
      spark, orders, lineitem, "o_orderkey", 8,
      "t_bucket_orders", "t_bucket_lineitem")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin") && plan.contains("Bucketed: true"),
        s"expected bucketed sort-merge join:\n$plan")
      // result parity with a plain join
      assert(joined.count() ==
        orders.join(lineitem, "o_orderkey").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS t_bucket_orders")
      spark.sql("DROP TABLE IF EXISTS t_bucket_lineitem")
    }
  }

  test("salted aggregation equals direct aggregation exactly") {
    val direct = Tables.events(spark, sfSmoke)
      .groupBy("event_type")
      .agg(round(sum("value"), 4).as("sum_value"), count(lit(1)).as("n_rows"))
    val salted = ScalePatterns
      .saltedSumBy(Tables.events(spark, sfSmoke), "event_type", "value", 16)
      .select(col("event_type"), round(col("sum_value"), 4).as("sum_value"),
              col("n_rows"))
    assert(direct.exceptAll(salted).isEmpty && salted.exceptAll(direct).isEmpty)
  }

  test("salted aggregation spreads a hot key across salt partitions") {
    val salted = Tables.events(spark, sfSmoke)
      .withColumn("__salt", pmod(xxhash64(col("value")), lit(16)))
      .groupBy("event_type", "__salt").count()
    val perKeySalts = salted.groupBy("event_type")
      .agg(countDistinct("__salt").as("n_salts"))
      .agg(min("n_salts")).head().getLong(0)
    assert(perKeySalts > 8, s"hot keys should spread over >8 of 16 salts")
  }
}
