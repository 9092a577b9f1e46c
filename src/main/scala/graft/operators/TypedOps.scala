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

  case class Li(l_returnflag: String, l_quantity: Double,
                l_extendedprice: Double, l_discount: Double)

  def typedDatasetOps(s: SparkSession, sf: String): DataFrame = {
    import s.implicits._
    val ds = Tables.lineitem(s, sf)
      .select(col("l_returnflag"), col("l_quantity"),
              col("l_extendedprice"), col("l_discount"))
      // typed-land gate: Li's primitive Double fields cannot encode a
      // null — drop incomplete rows before .as[] (the SQL twin's filter
      // and null-skipping aggregates would ignore them anyway).
      .na.drop()
      .as[Li]
    ds.filter((li: Li) => li.l_quantity > 10)
      .groupByKey((li: Li) => li.l_returnflag)
      .mapGroups { (flag: String, it: Iterator[Li]) =>
        var n = 0L
        var revenue = 0.0
        it.foreach { li =>
          n += 1
          revenue += li.l_extendedprice * (1.0 - li.l_discount)
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
