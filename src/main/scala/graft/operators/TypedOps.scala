package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Typed Dataset[T] API surface (SURVEY.md §2.11 adjunct): case-class
  * encoders, typed filter/groupByKey/mapGroups. The typed lambdas are
  * opaque to Catalyst — no predicate pushdown through a typed filter, no
  * partial aggregation through mapGroups — so the scalable form of this
  * exact query is the untyped agg_groupby / the Aggregator in
  * agg_udaf_typed; this entry exists to prove the API surface with an
  * oracle-checked result. The needed columns are projected BEFORE
  * entering typed land, so column pruning still reaches the scan.
  */
object TypedOps {

  /** Option fields, not primitives: a bare Double field cannot encode a
    * null and one dirty row kills the job with NOT_NULL_ASSERT_VIOLATION;
    * Option[Double] round-trips nullable columns loss-free AND keeps the
    * typed lambdas aligned with SQL null semantics (a null quantity fails
    * the > filter; a null price contributes nothing to the sum but the
    * row still counts — exactly what the oracle computes). */
  case class Li(l_returnflag: String, l_quantity: Option[Double],
                l_extendedprice: Option[Double], l_discount: Option[Double])

  def typedDatasetOps(s: SparkSession, sf: String): DataFrame = {
    import s.implicits._
    val ds = Tables.lineitem(s, sf)
      .select(col("l_returnflag"), col("l_quantity"),
              col("l_extendedprice"), col("l_discount"))
      .as[Li]
    ds.filter((li: Li) => li.l_quantity.exists(_ > 10))
      .groupByKey((li: Li) => li.l_returnflag)
      .mapGroups { (flag: String, it: Iterator[Li]) =>
        var n = 0L
        var revenue = 0.0
        it.foreach { li =>
          n += 1
          revenue += (for (p <- li.l_extendedprice; d <- li.l_discount)
            yield p * (1.0 - d)).getOrElse(0.0)
        }
        (flag, revenue, n)
      }
      .toDF("l_returnflag", "revenue_raw", "n_items")
      .select(col("l_returnflag"),
              round(col("revenue_raw"), 4).as("revenue"),
              col("n_items"))
      .orderBy("l_returnflag")
  }
}
