package graft

import org.apache.spark.sql.functions._
import graft.operators.UserFrames

/** Differential guard for the session-memoized user-day rollup
  * (UserFrames): its 11 consumers are oracle-checked end-to-end, but a
  * drift in the memo's own definition (a lost filter, a changed
  * measure) would surface there as an opaque hash mismatch — this spec
  * pins the rollup against the raw events table directly, at the grain
  * where the bug would live.
  */
class UserFramesSpec extends SparkSpecBase {

  test("rollup measures re-aggregate to the raw events totals") {
    val uf = UserFrames.daily(spark, sfOracle)
    val got = uf.agg(
      sum(col("c")).as("rows"),
      sum(col("cv")).as("vals"),
      min(col("d")).as("d0"),
      max(col("d")).as("d1")).head()
    val raw = Tables.events(spark, sfOracle)
      .filter(col("user_id").isNotNull)
      .agg(count(lit(1)).as("rows"),
        count(col("value")).as("vals"),
        min(to_date(col("ts"))).as("d0"),
        max(to_date(col("ts"))).as("d1")).head()
    assert(got.getLong(0) == raw.getLong(0), "event count must be partitioned by the cells")
    assert(got.getLong(1) == raw.getLong(1), "non-null value count must match")
    assert(got.getDate(2) == raw.getDate(2) && got.getDate(3) == raw.getDate(3),
      "day extrema must match")
  }

  test("a sampled user's cells match a direct per-cell aggregate") {
    val uid = Tables.events(spark, sfOracle)
      .filter(col("user_id").isNotNull)
      .select(col("user_id")).head().getLong(0)
    val fromMemo = UserFrames.daily(spark, sfOracle)
      .filter(col("user_id") === uid)
      .select(col("event_type"), col("d"), col("c"), col("cv"),
        col("xsc"), col("v200"))
      .collect().map(_.toSeq).toSet
    val direct = Tables.events(spark, sfOracle)
      .filter(col("user_id") === uid)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("c"), count(col("value")).as("cv"),
        sum(round(col("value") * 100d, 0).cast("long")).as("xsc"),
        max(when(col("value") > 200, 1L).otherwise(0L)).as("v200"))
      .collect().map(_.toSeq).toSet
    assert(fromMemo == direct,
      s"cells diverge for user $uid:\nmemo=$fromMemo\ndirect=$direct")
  }

  test("xsc is LOSSLESS: cell cents always reconstruct the raw double sum") {
    // the cents-scaled pattern (r11 verdict ask #4) is only exact
    // because every corpus value carries <= 2 decimals; this is the
    // canary that fails if the generator ever emits finer precision
    val bad = Tables.events(spark, sfOracle)
      .filter(col("value").isNotNull &&
        abs(col("value") * 100d - round(col("value") * 100d, 0)) > lit(1e-6))
      .count()
    assert(bad == 0L, s"$bad event values are not 2-decimal — " +
      "the xsc cents scaling would be lossy")
  }

  test("null user_ids never enter the rollup; repeat calls hit the memo") {
    val uf = UserFrames.daily(spark, sfOracle)
    assert(uf.filter(col("user_id").isNull).count() == 0)
    // getOrElseUpdate must hand back the SAME checkpointed frame — a
    // fresh build per call would silently void the amortization
    assert(UserFrames.daily(spark, sfOracle) eq uf)
  }
}
