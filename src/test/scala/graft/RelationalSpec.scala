package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Correctness invariants for the §2.1–§2.7 operators, run at sf0.001.
  * The oracle-differential bar itself is tools/oracle_check.py (run per
  * milestone against sf0.01); these specs encode the algebraic laws from
  * SURVEY.md §5.2 so regressions surface in `sbt test` without python.
  */
class RelationalSpec extends SparkSpecBase {

  test("entry (flagship) returns >0 rows — t1 smoke bar") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and every oracleSql key exists in queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfSmoke).count()
      withClue(name) { assert(n >= 0) }
    }
  }

  test("agg_groupby: group count matches distinct flag/status pairs") {
    val df = Relational.aggGroupBy(spark, sfSmoke)
    val pairs = Tables.lineitem(spark, sfSmoke)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .select("l_returnflag", "l_linestatus").distinct().count()
    assert(df.count() == pairs)
  }

  test("semi union anti partitions customer on the urgent-order predicate") {
    val semi = Relational.joinSemi(spark, sfSmoke).count()
    val anti = Relational.joinAnti(spark, sfSmoke).count()
    val all = Tables.customer(spark, sfSmoke).count()
    assert(semi + anti == all)
  }

  test("left outer join keeps every customer") {
    assert(Relational.joinLeftOuter(spark, sfSmoke).count() ==
      Tables.customer(spark, sfSmoke).count())
  }

  test("union_distinct == distinct(union_all keys)") {
    val ua = Relational.setUnionAll(spark, sfSmoke).select("user_id").distinct()
    val ud = Relational.setUnionDistinct(spark, sfSmoke)
    assert(ua.exceptAll(ud).isEmpty && ud.exceptAll(ua).isEmpty)
  }

  test("intersect ⊆ both inputs; except disjoint from subtrahend") {
    val i = Relational.setIntersect(spark, sfSmoke)
    val clicks = Tables.events(spark, sfSmoke)
      .filter(col("event_type") === "click").select("user_id").distinct()
    assert(i.exceptAll(i.intersect(clicks)).isEmpty)
  }

  test("approx_count_distinct within 15% of exact") {
    val exact = Relational.aggCountDistinct(spark, sfSmoke)
      .select(col("event_type"), col("n_users"))
    val approx = Relational.aggApproxDistinct(spark, sfSmoke)
    val joined = exact.join(approx, "event_type").collect()
    joined.foreach { r =>
      val e = r.getAs[Long]("n_users").toDouble
      val a = r.getAs[Long]("approx_users").toDouble
      assert(math.abs(a - e) / e <= 0.15, s"approx $a vs exact $e")
    }
  }

  test("limit_topk returns exactly 10 rows in descending price order") {
    val rows = Relational.limitTopK(spark, sfSmoke).collect()
    assert(rows.length == 10)
    val prices = rows.map(_.getAs[Double]("l_extendedprice"))
    assert(prices.sameElements(prices.sortBy(-_)))
  }

  test("filter_pred rows all satisfy the predicate") {
    val bad = Relational.filterPred(spark, sfSmoke)
      .filter(!col("l_returnflag").isin("A", "R") ||
              !col("l_quantity").between(10, 40)).count()
    assert(bad == 0)
  }
}
