package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Behavioral-statistics operators — the analysis a user-study platform
  * (SURVEY §1.1) runs on its event stream: A/B comparison, event-flow
  * transitions, and outlier detection. All pure aggregate/window
  * algebra; aggregated-double outputs and comparisons are rounded on
  * both engine sides per the §0.3 determinism convention.
  */
object Stats {

  /** A/B experiment comparison (Welch's t): users hash deterministically
    * into arms (md5 first hex char, 0-7 → A, else B — md5 is the
    * cross-engine-identical hash), the purchase-value metric aggregates
    * per arm, and the t statistic compares the means.
    *
    * Scale shape: ONE conditional aggregate over the filtered events
    * scan — n/mean/variance for both arms in a single pass (each stat is
    * an expression over `when(arm, value)`), then scalar math on the
    * 1-row result. No join, no second pass, map-side combinable.
    */
  def experimentTtest(s: SparkSession, sf: String): DataFrame = {
    val a = substring(md5(col("user_id").cast("string").cast("binary")), 1, 1)
      .isin("0", "1", "2", "3", "4", "5", "6", "7")
    val va = when(a, col("value"))
    val vb = when(!a, col("value"))
    Tables.events(s, sf)
      .filter(col("event_type") === "purchase" && col("user_id").isNotNull)
      .agg(count(va).as("n_a"), count(vb).as("n_b"),
           avg(va).as("mean_a"), avg(vb).as("mean_b"),
           var_samp(va).as("var_a"), var_samp(vb).as("var_b"))
      .select(col("n_a"), col("n_b"),
        round(col("mean_a"), 6).as("mean_a"),
        round(col("mean_b"), 6).as("mean_b"),
        round((col("mean_a") - col("mean_b")) /
              sqrt(col("var_a") / col("n_a") + col("var_b") / col("n_b")), 4)
          .as("t_stat"))
  }

  /** Event-flow transition matrix: P(next event type | current) per
    * user journey — the Markov view of a funnel. One window shuffle on
    * user_id for the lag, one ≤|types|² aggregate for the counts; the
    * row-share denominator is a window over the tiny aggregated matrix.
    */
  def pathTransitions(s: SparkSession, sf: String): DataFrame = {
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val wPrev = Window.partitionBy(col("prev_type"))
    Tables.events(s, sf)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"),
              lag(col("event_type"), 1).over(ord).as("prev_type"),
              col("event_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("share",
        round(col("n").cast("double") / sum(col("n")).over(wPrev), 6))
      .orderBy("prev_type", "event_type")
  }

  /** Per-user outlier detection: purchases whose value sits more than
    * 2 rounded z-scores from that user's own mean. Users need ≥ 5
    * purchases (a 2-point std is noise); std = 0 (all-identical values
    * — exactly representable, so exactly zero on both engines) is
    * excluded before the division. The z compare uses the ROUNDED z on
    * both engines — the repo's round-before-compare rule for
    * aggregated-double thresholds.
    *
    * Scale shape: per-user mean/std as one window over the user
    * shuffle, z map-side, no join-back.
    */
  def anomalyZscore(s: SparkSession, sf: String): DataFrame = {
    val wu = Window.partitionBy(col("user_id"))
    Tables.events(s, sf)
      .filter(col("event_type") === "purchase" && col("user_id").isNotNull)
      .select(col("user_id"), col("event_id"), col("value"),
              count(lit(1)).over(wu).as("n_u"),
              avg(col("value")).over(wu).as("mean_u"),
              stddev_samp(col("value")).over(wu).as("std_u"))
      .filter(col("n_u") >= 5 && col("std_u") > 0)
      .withColumn("z", round((col("value") - col("mean_u")) / col("std_u"), 4))
      .filter(abs(col("z")) > 2.0)
      .select(col("user_id"), col("event_id"), round(col("value"), 4).as("value"),
              col("z"))
      .orderBy("user_id", "event_id")
  }

  /** Time-series resampling with gap fill: per-user daily purchase
    * totals on a CONTIGUOUS day grid — missing days surface as explicit
    * zero rows with `observed = false`. Downstream models (retention
    * curves, forecasting) need the gaps as rows, not as absences.
    *
    * Scale shape: aggregate first (events → one row per (user, day)),
    * THEN build the grid from each user's own [min, max] span — the
    * explode is bounded by span-days × users, never events × days; the
    * grid⋈daily join is a hash join on (user_id, day) between two
    * user-day-grain frames. Day totals are rounded on both engines
    * (non-integral doubles, §0.3 convention).
    */
  def timeseriesResample(s: SparkSession, sf: String): DataFrame = {
    val daily = Tables.events(s, sf)
      .filter(col("event_type") === "purchase" && col("user_id").isNotNull)
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(round(sum(col("value")), 4).as("day_value"))
    val grid = daily.groupBy(col("user_id"))
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(col("user_id"),
              explode(expr("sequence(d0, d1, interval 1 day)")).as("d"))
    grid.join(daily, Seq("user_id", "d"), "left")
      .select(col("user_id"), col("d"),
              coalesce(col("day_value"), lit(0.0)).as("day_value"),
              col("day_value").isNotNull.as("observed"))
      .orderBy("user_id", "d")
  }

  /** Chi-square independence test on the source × lang contingency
    * matrix — "is language distribution independent of source" (the
    * stratification sanity check before mixing corpus domains). Emits
    * each cell's observed count, expected count under independence, and
    * its χ² contribution; the test statistic is the contribution sum.
    *
    * Scale shape: ONE partial+final HashAggregate over the scan builds
    * the contingency matrix (≤ |sources|·|langs| cells); the row/col/
    * grand totals are windows over that tiny matrix, so the only
    * data-sized cost is the first aggregate.
    */
  def statsChiSquare(s: SparkSession, sf: String): DataFrame = {
    val wRow = Window.partitionBy(col("source"))
    val wCol = Window.partitionBy(col("lang"))
    val wAll = Window.partitionBy()
    Tables.documents(s, sf)
      .filter(col("source").isNotNull && col("lang").isNotNull)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("obs"))
      .withColumn("exp",
        sum(col("obs")).over(wRow) * sum(col("obs")).over(wCol) /
          sum(col("obs")).over(wAll))
      .select(col("source"), col("lang"), col("obs"),
        round(col("exp"), 4).as("expected"),
        round(pow(col("obs") - col("exp"), 2) / col("exp"), 6)
          .as("chi2_contrib"))
      .orderBy("source", "lang")
  }

  /** Market-basket pair affinity — the top-20 part pairs that co-occur
    * in orders, with support and lift (the association-rule starter:
    * lift > 1 means the pair attracts, < 1 repels). Self-join blocked
    * on the basket key, so the pair space is Σ k²/2 over basket sizes —
    * bounded by items-per-order, never a global n².
    *
    * Scale shape: (order, part) distinct → orderkey-blocked self-join
    * (fan-out ≈ avg basket² ≈ 50, constant) → pair HashAggregate →
    * distributed TakeOrderedAndProject top-20 → broadcast joins for the
    * two singles lookups + the order-count scalar. Nothing global-sorts
    * and the only big shuffles carry (order, part) and pair counts.
    *
    * Measured alternative, rejected: a collect_list + tagged-generate
    * single-pass (pairs, singleton markers, and the order marker out of
    * one explode) was 3.3 s vs 2.7 s at sf0.1 — the interpreted
    * transform/flatten lambdas recompute 3× (no ReuseExchange on the
    * shared aggregate) and lose to four cheap whole-stage-codegen
    * passes. Codegen-everywhere beats fewer-passes-interpreted.
    */
  def basketAffinity(s: SparkSession, sf: String): DataFrame = {
    val items = Tables.lineitem(s, sf)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val nOrders = items.agg(countDistinct(col("o")).as("n_orders"))
    val singles = items.groupBy(col("p")).agg(count(lit(1)).as("n_p"))
    val pairs = items.as("a").join(items.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("p1"), col("b.p").as("p2"))
      .agg(count(lit(1)).as("n_pair"))
      .orderBy(col("n_pair").desc, col("p1").asc, col("p2").asc)
      .limit(20)
    pairs
      .join(broadcast(singles.withColumnRenamed("p", "p1")
        .withColumnRenamed("n_p", "n_p1")), "p1")
      .join(broadcast(singles.withColumnRenamed("p", "p2")
        .withColumnRenamed("n_p", "n_p2")), "p2")
      .crossJoin(broadcast(nOrders))
      .select(col("p1"), col("p2"), col("n_pair"),
        round(col("n_pair") / col("n_orders"), 6).as("support"),
        round(col("n_pair") * col("n_orders") /
          (col("n_p1") * col("n_p2")), 6).as("lift"))
      .orderBy(col("n_pair").desc, col("p1").asc, col("p2").asc)
  }

  /** RFM segmentation — the standard customer-value grid: each
    * purchaser scored 1–5 on Recency (days since last purchase, anchored
    * at the corpus's latest purchase day), Frequency, and Monetary,
    * with quintile boundaries from EXACT interpolated percentiles.
    *
    * Scale note: quintile labels from a global `ntile` window would
    * single-partition the user frame; thresholds-as-aggregates keep the
    * whole thing distributive — one user-grain shuffle, one 13-scalar
    * threshold aggregate broadcast back, pure projection after. The
    * user frame is computed twice (thresholds + labeling), the
    * summarize-then-compare shape; at 100 TB persist the user frame or
    * accept two identical one-shuffle passes. Thresholds and metrics
    * are rounded before comparison so boundary users land identically
    * on both engines.
    */
  def behaviorRfm(s: SparkSession, sf: String): DataFrame = {
    val u = Tables.events(s, sf)
      .filter(col("event_type") === "purchase" && col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(datediff(max(to_date(col("ts"))), lit("1970-01-01").cast("date"))
             .cast("bigint").as("ld"),
           count(lit(1)).as("frequency"),
           round(sum(col("value")), 4).as("monetary"))
    val qs = Seq(0.2, 0.4, 0.6, 0.8)
    val thCols = max(col("ld")).as("anchor") +:
      (qs.map(q => round(expr(s"percentile(ld, $q)"), 6).as(s"ld${(q * 100).toInt}")) ++
       qs.map(q => round(expr(s"percentile(frequency, $q)"), 6).as(s"f${(q * 100).toInt}")) ++
       qs.map(q => round(expr(s"percentile(monetary, $q)"), 6).as(s"m${(q * 100).toInt}")))
    val th = u.agg(thCols.head, thCols.tail: _*)
    def score(x: org.apache.spark.sql.Column, pre: String) =
      qs.map(q => (x > col(s"$pre${(q * 100).toInt}")).cast("long"))
        .foldLeft(lit(1L))(_ + _)
    u.crossJoin(broadcast(th))
      .select(col("user_id"),
        (col("anchor") - col("ld")).as("recency_days"),
        col("frequency"), col("monetary"),
        score(col("ld"), "ld").as("r_score"),
        score(col("frequency"), "f").as("f_score"),
        score(col("monetary"), "m").as("m_score"))
      .withColumn("segment",
        concat(lit("R"), col("r_score"), lit("F"), col("f_score"),
               lit("M"), col("m_score")))
      .orderBy("user_id")
  }

  /** Gini coefficient of per-user purchase spend — revenue-concentration
    * in one number (0 = equal, →1 = one whale), by the rank formula
    * G = 2·Σ(i·xᵢ) / (n·Σx) − (n+1)/n over ascending spend.
    *
    * Scale shape: the global rank never materializes and there is no
    * global-window sort. Σi·x decomposes per log-scale bucket as
    * off_b·Σx_b + Σ(j·x)_b (j = intra-bucket rank, off_b = users in
    * lower buckets from a running sum over the tiny bucket summary), so
    * the plan is one user-shuffle, one bucket-shuffle, and two
    * O(#buckets) single-partition points — the stream_late_audit
    * two-pass prefix shape, but join-back-free: no subtree computes
    * twice (plan-pinned). Tied spends share a bucket and make Σi·x
    * tie-order-independent, so the rank tiebreak never reaches the
    * result.
    */
  def aggGini(s: SparkSession, sf: String): DataFrame = {
    // monotone log-scale bucket key: needs NO min/max pre-pass (a
    // bounds scalar would recompute the spend subtree — the q2-style
    // ReuseExchange defeat), and same-spend ties always share a bucket
    val spend = Tables.events(s, sf)
      .filter(col("event_type") === "purchase" && col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(round(sum(col("value")), 4).as("x"))
      .withColumn("bkt", floor(log1p(col("x")) * 8.0).cast("bigint"))
    // decompose Σ global-rank·x per bucket: with j the intra-bucket
    // rank and off_b the count of users in lower buckets,
    // Σ i·x = Σ_b [ off_b·Σx_b + Σ(j·x)_b ] — so ONE window pass per
    // bucket + a tiny per-bucket summary replace any global sort or
    // join-back; no part of the spend subtree is computed twice
    val j = row_number().over(Window.partitionBy(col("bkt"))
      .orderBy(col("x").asc, col("user_id").asc))
    spend
      .withColumn("j", j)
      .groupBy(col("bkt"))
      .agg(count(lit(1)).as("n_b"), sum(col("x")).as("sx_b"),
           sum(col("j") * col("x")).as("jx_b"))
      .withColumn("off_b", coalesce(sum(col("n_b")).over(
        Window.orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .agg(sum(col("n_b")).cast("bigint").as("n_users"),
           round(sum(col("sx_b")), 4).as("total_spend"),
           round(lit(2.0) * sum(col("off_b") * col("sx_b") + col("jx_b")) /
               (sum(col("n_b")) * sum(col("sx_b"))) -
             (sum(col("n_b")) + lit(1.0)) / sum(col("n_b")), 6).as("gini"))
  }

  /** Per-segment linear trend: OLS of the purchase metric on time (days
    * since epoch) via the ANSI `regr_*` aggregate family — slope,
    * intercept, fit quality, and pair count per event_type. The x axis
    * is an INTEGER day index (`datediff` vs 1970-01-01), so both engines
    * aggregate identical inputs; only the regression outputs are doubles
    * and they are rounded per §0.3.
    *
    * Scale shape: one partial+final HashAggregate over the events scan —
    * `regr_*` are sum-of-moments aggregates (map-side combinable,
    * constant state per group), the same cost as an `avg`.
    */
  def statsTrendRegression(s: SparkSession, sf: String): DataFrame =
    Tables.events(s, sf)
      .filter(col("user_id").isNotNull && col("value").isNotNull)
      .select(col("event_type"),
              datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
                .cast("double").as("x"),
              col("value").as("y"))
      .groupBy(col("event_type"))
      .agg(round(regr_slope(col("y"), col("x")), 6).as("slope_per_day"),
           round(regr_intercept(col("y"), col("x")), 4).as("intercept"),
           round(regr_r2(col("y"), col("x")), 6).as("r2"),
           regr_count(col("y"), col("x")).cast("bigint").as("n_pairs"))
      .orderBy("event_type")

  /** Forward-fill imputation over the daily grid — the other standard
    * gap policy next to `timeseries_resample`'s zero-fill: a missing day
    * carries the last observed day's value forward (sensor/metrics
    * semantics, "last known state"). Leading days are always observed
    * because each user's grid starts at their first active day.
    *
    * Scale shape: same grid build as the resample, plus ONE running
    * `last(ignoreNulls)` window per user — the join output is already
    * hash-partitioned by (user_id, d), but the window needs user_id
    * clustering, so the window adds the single per-user exchange; frame
    * is rows-unbounded-preceding (O(1) state per row, no buffering).
    */
  def timeseriesFfill(s: SparkSession, sf: String): DataFrame = {
    val daily = Tables.events(s, sf)
      .filter(col("event_type") === "purchase" && col("user_id").isNotNull)
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(round(sum(col("value")), 4).as("day_value"))
    val grid = daily.groupBy(col("user_id"))
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(col("user_id"),
              explode(expr("sequence(d0, d1, interval 1 day)")).as("d"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("d").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "d"), "left")
      .select(col("user_id"), col("d"),
              last(col("day_value"), ignoreNulls = true).over(w)
                .as("filled_value"),
              col("day_value").isNotNull.as("observed"))
      .orderBy("user_id", "d")
  }
}
