package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Subquery surface via spark.sql — scalar, correlated, and LATERAL.
  * These exercise Catalyst's decorrelation machinery
  * (RewriteCorrelatedScalarSubquery / DecorrelateInnerQuery): each
  * correlated form is planned as a join + aggregate, never a per-row
  * re-execution — which is exactly why they scale. */
object Subqueries {

  private def withViews(s: SparkSession, sf: String): Unit = {
    Tables.customer(s, sf).createOrReplaceTempView("sq_customer")
    Tables.orders(s, sf).createOrReplaceTempView("sq_orders")
  }

  /** Uncorrelated scalar subquery — a broadcast single-value join. */
  def subqueryScalar(s: SparkSession, sf: String): DataFrame = {
    withViews(s, sf)
    s.sql(
      """SELECT c_custkey,
        |       round((SELECT max(o_totalprice) FROM sq_orders), 4)
        |         AS global_max
        |FROM sq_customer
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Correlated scalar subquery — decorrelated to a left outer join over
    * a grouped aggregate. */
  def subqueryCorrelated(s: SparkSession, sf: String): DataFrame = {
    withViews(s, sf)
    s.sql(
      """SELECT c_custkey,
        |       (SELECT count(*) FROM sq_orders WHERE o_custkey = c_custkey)
        |         AS n_orders
        |FROM sq_customer
        |ORDER BY c_custkey""".stripMargin)
  }

  /** LATERAL join: top-2 orders per customer through a correlated
    * ordered-limit subquery (the relational form of win_topk). */
  def joinLateral(s: SparkSession, sf: String): DataFrame = {
    withViews(s, sf)
    s.sql(
      """SELECT c_custkey, t.o_orderkey,
        |       round(t.o_totalprice, 4) AS o_totalprice
        |FROM sq_customer,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM sq_orders
        |         WHERE o_custkey = c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY c_custkey, o_orderkey""".stripMargin)
  }
}
