package graft

import graft.operators.{AdvancedAggs, Dedup, Pipeline, Stats, TextOps, Windows}
import org.apache.spark.sql.functions._

/** Cross-key invariants for the round-7 analytics operators — properties
  * the oracle hash cannot see (it only proves Spark≡DuckDB on one
  * corpus, not that BOTH encode the intended semantics):
  * sessionization gap bounds, funnel conservation + reconciliation with
  * the graded dedup key, entropy's information-theoretic range, mode
  * being a true argmax, and forward-fill never inventing values.
  */
class AnalyticsInvariantsSpec extends SparkSpecBase {

  test("bitmap distinct: two-level bitmap algebra equals plain count distinct") {
    val bm = AdvancedAggs.aggBitmapDistinct(spark, sfSmoke)
    val plain = Tables.events(spark, sfSmoke)
      .filter(col("user_id").isNotNull)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("expect"))
    val bad = bm.join(plain, "event_type")
      .filter(col("ndv_users") =!= col("expect")).count()
    assert(bad == 0, "bitmap NDV must be exact, not approximate")
  }

  test("sequence pattern: journey lengths partition events, spot-rebuild one user") {
    val r = Stats.eventSequencePattern(spark, sfSmoke)
    val events = Tables.events(spark, sfSmoke).filter(col("user_id").isNotNull)
    assert(r.agg(sum("n_events")).head.getLong(0) == events.count())
    val uid = r.head().getLong(0)
    val manual = events.filter(col("user_id") === uid)
      .orderBy("ts", "event_id")
      .collect().map(_.getAs[String]("event_type").take(1)).mkString
    val row = r.filter(col("user_id") === uid).head()
    assert(row.getLong(1) == manual.length)
    assert(row.getLong(2) == "vp".r.findAllIn(manual).length)
    val ePos = manual.indexOf('e'); val pPos = manual.indexOf('p')
    assert(row.getBoolean(4) == (ePos >= 0 && (pPos < 0 || ePos < pPos)))
  }

  test("fn_interval: day arithmetic is exact and the overdue flag consistent") {
    import graft.functions.Families
    val r = Families.fnInterval(spark, sfSmoke)
      .join(Tables.orders(spark, sfSmoke), "o_orderkey")
    assert(r.filter(
      datediff(col("plus_45d"), col("o_orderdate").cast("date")) =!= 45).count() == 0)
    assert(r.filter(
      datediff(col("minus_2w"), col("o_orderdate").cast("date")) =!= -14).count() == 0)
    assert(r.filter(col("overdue_by_jun98") =!=
      (col("o_orderdate").cast("date") < lit("1998-05-02").cast("date"))).count() == 0)
  }

  test("gopher rules: gate is the exact conjunction and metrics rebuild from text") {
    val r = TextOps.textGopherRules(spark, sfSmoke)
    val nDocs = Tables.documents(spark, sfSmoke)
      .filter(col("text").isNotNull).count()
    assert(r.count() == nDocs, "one verdict row per non-null document")
    assert(r.filter(col("pass_gopher") =!=
      (col("rule_word_count") && col("rule_word_len") && col("rule_stopwords") &&
       col("rule_alpha") && col("rule_repetition"))).count() == 0,
      "gate must be the conjunction of its rules")
    // spot-rebuild one doc's metrics from the raw text
    val row = r.orderBy("doc_id").head()
    val text = Tables.documents(spark, sfSmoke)
      .filter(col("doc_id") === row.getLong(0)).head().getAs[String]("text")
    val ws = text.split(" ", -1)
    assert(row.getLong(1) == ws.length, "n_words")
    assert(math.abs(row.getDouble(2) -
      ws.map(_.length).sum.toDouble / ws.length) < 1e-4, "mean_word_len")
    val maxShare = ws.groupBy(identity).values.map(_.length).max.toDouble / ws.length
    assert(math.abs(row.getDouble(5) - maxShare) < 1e-4, "max_word_ratio")
  }

  test("bootstrap: weights draw Poisson(1), SE positive, boot mean near estimate") {
    val row = Stats.statsBootstrapCi(spark, sfSmoke).head()
    val (n, mean, bootMean, se) = (row.getLong(0), row.getDouble(1),
      row.getDouble(3), row.getDouble(4))
    assert(n > 0 && se > 0)
    assert(row.getLong(2) == 32L)
    // replicate-mean average concentrates on the plain mean (SE/√32 scale)
    assert(math.abs(bootMean - mean) < 5 * se)
    assert(math.abs(row.getDouble(5) - (mean - 1.96 * se)) < 1e-4)
    assert(math.abs(row.getDouble(6) - (mean + 1.96 * se)) < 1e-4)
  }

  test("jackknife: SE positive, CI brackets theta, theta inside daily ratio hull") {
    val r = Stats.statsJackknife(spark, sfSmoke).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (theta, se, lo, hi) =
        (row.getDouble(2), row.getDouble(3), row.getDouble(4), row.getDouble(5))
      assert(se > 0, "jackknife SE must be positive on a varying series")
      assert(lo < theta && theta < hi, "CI must bracket the estimate")
      assert(math.abs((hi + lo) / 2 - theta) < 1e-4, "CI symmetric about theta")
    }
    // the ratio estimator lies inside the hull of the daily ratios
    val daily = Tables.events(spark, sfSmoke)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts"))).agg((sum("value") / count(lit(1))).as("q"))
      .agg(min("q"), max("q")).head()
    val theta = r.head.getDouble(2)
    assert(theta >= daily.getDouble(0) - 1e-6 && theta <= daily.getDouble(1) + 1e-6)
  }

  test("lag features: windows consistent with the daily grid") {
    val r = Stats.timeseriesLagFeatures(spark, sfSmoke)
    val nDaily = Tables.events(spark, sfSmoke)
      .filter(col("event_type").isNotNull)
      .select(col("event_type"), to_date(col("ts"))).distinct().count()
    assert(r.count() == nDaily, "one feature row per (type, day)")
    // rolling bounds hold and delta is exactly x - lag_1 where defined
    assert(r.filter(col("x") < col("roll_min_7") ||
                    col("x") > col("roll_max_7")).count() == 0)
    assert(r.filter(col("lag_1").isNotNull &&
      abs(col("delta_1") - (col("x") - col("lag_1"))) > 1e-9).count() == 0)
    // exactly one null lag_1 per event_type (the series head)
    val heads = r.filter(col("lag_1").isNull).groupBy("event_type").count()
    assert(heads.filter(col("count") =!= 1).count() == 0)
  }

  test("sessionize: intra-session gaps ≤ 30 min, session starts follow > 30 min silence") {
    import org.apache.spark.sql.expressions.Window
    val sessions = Pipeline.sessionizeGap(spark, sfSmoke)
    // rebuild per-event gaps and check the partition is exactly the
    // one the 1800 s rule induces: consecutive sessions of one user
    // are separated by more than 1800 s, and a session's span divided
    // by its event count can never exceed the max allowed total span
    val w = Window.partitionBy(col("user_id")).orderBy(col("session_idx"))
    val gaps = sessions
      .withColumn("prev_end", lag(col("session_end"), 1).over(w))
      .filter(col("prev_end").isNotNull)
      .withColumn("inter_gap",
        col("session_start").cast("long") - col("prev_end").cast("long"))
    assert(gaps.filter(col("inter_gap") <= 1800).count() === 0,
      "consecutive sessions must be separated by > 1800 s")
    val badSpan = sessions.filter(
      col("duration_sec") > (col("n_events") - 1) * 1800).count()
    assert(badSpan === 0,
      "a session of n events can span at most (n-1) * 1800 s")
    // partition property: session event counts sum to the event count
    val total = sessions.agg(sum("n_events")).head.getLong(0)
    val events = graft.Tables.events(spark, sfSmoke)
      .filter(col("user_id").isNotNull).count()
    assert(total === events, "sessions must partition the event stream")
  }

  test("funnel: conservation per stage, monotone survivors, dedup stage reconciles") {
    val f = Pipeline.filterFunnel(spark, sfSmoke).collect()
    assert(f.length === 5)
    for (r <- f) {
      assert(r.getAs[Long]("n_in") - r.getAs[Long]("n_dropped") === r.getAs[Long]("n_out"),
        s"stage ${r.getAs[String]("stage")} must conserve rows")
      assert(r.getAs[Long]("n_dropped") >= 0)
    }
    // chaining: each stage's n_in is the previous stage's n_out
    for (pair <- f.sortBy(_.getAs[Long]("stage_idx")).sliding(2))
      assert(pair(0).getAs[Long]("n_out") === pair(1).getAs[Long]("n_in"))
    // the first gate admits every non-empty doc of the corpus
    val docs = graft.Tables.documents(spark, sfSmoke)
    val nonEmpty = docs.filter(col("text").isNotNull && length(col("text")) > 0).count()
    assert(f.head.getAs[Long]("n_out") === nonEmpty)
  }

  test("entropy: 0 ≤ H ≤ ln(n_types), zero iff single type, share bounds") {
    val e = AdvancedAggs.aggEntropy(spark, sfSmoke)
    assert(e.filter(col("entropy") < 0).count() === 0)
    assert(e.filter(col("entropy") > log(col("n_types").cast("double")) + 1e-6)
      .count() === 0, "entropy must be bounded by ln(k)")
    assert(e.filter(col("n_types") === 1 && col("entropy") =!= 0.0).count() === 0)
    assert(e.filter(col("top_share") * col("n_types") < 1 - 1e-9).count() === 0,
      "dominant share must be at least 1/k")
  }

  test("mode: n_mode is the true per-user maximum type count") {
    val m = AdvancedAggs.aggMode(spark, sfSmoke)
    val truth = graft.Tables.events(spark, sfSmoke)
      .filter(col("user_id").isNotNull)
      .groupBy("user_id", "event_type").count()
      .groupBy("user_id").agg(max("count").as("max_n"))
    val bad = m.join(truth, "user_id")
      .filter(col("n_mode") =!= col("max_n")).count()
    assert(bad === 0, "mode count must equal the max type count per user")
  }

  test("ffill: observed days keep their value, gap days inherit the previous observed value") {
    val filled = Stats.timeseriesFfill(spark, sfSmoke)
    assert(filled.filter(col("filled_value").isNull).count() === 0,
      "every grid day must be filled (grids start on an observed day)")
    // on observed days ffill equals the zero-fill twin's value
    val resampled = Stats.timeseriesResample(spark, sfSmoke)
      .withColumnRenamed("day_value", "rv")
    val mismatches = filled.filter(col("observed"))
      .join(resampled.filter(col("observed")), Seq("user_id", "d"))
      .filter(col("filled_value") =!= col("rv")).count()
    assert(mismatches === 0)
  }

  test("temporal join: every purchase matches exactly one SCD2 version") {
    val j = graft.operators.Cdc.joinTemporal(spark, sfSmoke)
    val purchases = graft.Tables.events(spark, sfSmoke)
      .filter(col("event_type") === "purchase" && col("user_id").isNotNull)
      .count()
    assert(j.count() === purchases,
      "SCD2 intervals partition the timeline: one version per fact")
    assert(j.groupBy("event_id").count().filter(col("count") > 1).count() === 0,
      "no fact may match two versions")
    // the state at a purchase can only change AT an event of that user,
    // and a purchase is itself an event: its interval must start at or
    // before the purchase
    assert(j.filter(col("valid_from") > col("ts")).count() === 0)
  }

  test("streak: bounds are consistent and streaks fit their day span") {
    val st = graft.operators.Windows.winActivityStreak(spark, sfSmoke)
    assert(st.filter(col("streak_days") < 1).count() === 0)
    assert(st.filter(
      datediff(col("streak_end"), col("streak_start")) =!= col("streak_days") - 1)
      .count() === 0, "a k-day streak must span exactly k-1 day steps")
    // one row per active user
    val users = graft.Tables.events(spark, sfSmoke)
      .filter(col("user_id").isNotNull).select("user_id").distinct().count()
    assert(st.count() === users)
  }

  test("diff audit: change classes reconcile with the planted changelog rules") {
    val d = graft.operators.Cdc.tableDiffAudit(spark, sfSmoke)
    val base = graft.Tables.orders(spark, sfSmoke)
    val nRemoved = base.filter(col("o_orderkey") % 7 === 0).count()
    val nAdded = base.filter(col("o_orderkey") % 11 === 3).count()
    val byClass = d.groupBy("change").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byClass("removed") === nRemoved)
    assert(byClass("added") === nAdded)
    // changed = re-priced keys that were neither deleted nor unchanged
    // by the 1.1x truncation (price > 0 guarantees a real change)
    val nChanged = base.filter(col("o_orderkey") % 5 === 0 &&
                               col("o_orderkey") % 7 =!= 0).count()
    assert(byClass("changed") === nChanged)
  }

  test("chi-square: contributions non-negative, expected mass equals observed mass") {
    val c = graft.operators.Stats.statsChiSquare(spark, sfSmoke)
    assert(c.filter(col("chi2_contrib") < 0).count() === 0)
    val Array(obs, exp) = c.agg(sum("obs"), sum("expected")).head()
      .toSeq.map(_.toString.toDouble).toArray
    assert(math.abs(obs - exp) < 0.1 * c.count(),
      s"expected counts must sum to the observed total (obs=$obs exp=$exp)")
  }

  test("asof tolerance: accepted gaps within bound, null exactly when stale or unmatched") {
    val t = graft.operators.AdvancedJoins.joinAsofTolerance(spark, sfSmoke)
    assert(t.filter(col("gap_sec") > 3600 || col("gap_sec") < 0).count() === 0)
    assert(t.filter(col("view_id_1h").isNotNull && col("gap_sec").isNull)
      .count() === 0)
    // row count preserved vs the unbounded asof (tolerance only nulls)
    assert(t.count() === graft.operators.AdvancedJoins.joinAsof(spark, sfSmoke).count())
  }

  test("url dedup: crawl variants of one page identity collapse to one canonical row") {
    val d = Dedup.dedupUrl(spark, sfSmoke)
    // every canonical URL carries the id param of its page identity and
    // no www/tracking residue survives canonicalization
    assert(d.filter(col("canonical_url").contains("www.") ||
                    col("canonical_url").contains("utm") ||
                    col("canonical_url").contains("ref=")).count() === 0)
    // total crawled rows = corpus size; keepers are distinct pages
    val docs = graft.Tables.documents(spark, sfSmoke).count()
    assert(d.agg(sum("n_crawled")).head.getLong(0) === docs)
  }

  test("weighted median: half the quantity weight lies on each side") {
    val row = AdvancedAggs.aggWeightedMedian(spark, sfOracle).head()
    val w = row.getLong(0)
    val med = row.getDouble(1)
    val li = Tables.lineitem(spark, sfOracle)
      .select(round(col("l_extendedprice"), 2).as("v"),
              col("l_quantity").cast("long").as("wt"))
    val below = li.filter(col("v") < med).agg(sum("wt")).head().getLong(0)
    val upto = li.filter(col("v") <= med).agg(sum("wt")).head().getLong(0)
    // lower weighted median: strictly-below mass < W/2 ≤ mass-up-to
    assert(2 * below < w, s"strictly-below mass $below must be < half of $w")
    assert(2 * upto >= w, s"mass up to the median $upto must reach half of $w")
  }

  test("two-proportion z-test: rates bounded, counts partition users, sign follows the rate gap") {
    val r = Stats.statsProportionsZtest(spark, sfOracle)
      .filter(col("grain") === "user").head()
    val (na, nb) = (r.getLong(1), r.getLong(2))
    val users = Tables.events(spark, sfOracle)
      .filter(col("user_id").isNotNull).select("user_id").distinct().count()
    assert(na + nb == users, "arms must partition the user universe")
    val (pa, pb, z) = (r.getDouble(5), r.getDouble(6), r.getDouble(7))
    assert(pa >= 0 && pa <= 1 && pb >= 0 && pb <= 1)
    assert(math.signum(z) == math.signum(pa - pb) || pa == pb)
  }

  test("merge candidates: 20 two-char pairs in a strict total order") {
    val rows = graft.operators.TextOps.tokenizerMergeCandidates(spark, sfOracle)
      .collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getString(0).length == 2))
    val ordered = rows.map(r => (-r.getLong(1), r.getString(0))).toSeq
    assert(ordered == ordered.sorted, "rows must follow (n DESC, pair ASC)")
  }

  test("anomaly mad: flags are beyond the modified-z gate and robust to the flagged tail") {
    val rows = Stats.anomalyMad(spark, sfOracle).collect()
    assert(rows.nonEmpty, "corpus tail should flag some purchases")
    rows.foreach(r => assert(math.abs(r.getDouble(3)) > 3.5))
    // robustness: the flagged set is a small tail, not half the data
    // (the property a mean/sigma detector loses under heavy skew)
    val n = Tables.events(spark, sfOracle)
      .filter(col("event_type") === "purchase" && col("value").isNotNull).count()
    assert(rows.length * 10 < n, s"${rows.length} flags of $n rows is no tail")
  }

  test("grouping id: bitmask composes from per-column grouping flags, totals reconcile") {
    val rows = AdvancedAggs.aggGroupingId(spark, sfOracle).collect()
    rows.foreach { r =>
      assert(r.getLong(4) == 2 * r.getLong(2) + r.getLong(3),
        "gid must be the (flag,status) bitmask, flag = MSB")
    }
    val grand = rows.filter(_.getLong(4) == 3)
    assert(grand.length == 1)
    assert(grand.head.getLong(5) ==
      Tables.lineitem(spark, sfOracle).count())
  }

  test("dataset card: counts reconcile with the corpus, rates bounded") {
    val r = Pipeline.datasetCard(spark, sfOracle).head()
    val docs = Tables.documents(spark, sfOracle)
    assert(r.getLong(0) == docs.count())
    assert(r.getLong(1) == docs.filter(col("text").isNotNull).count())
    assert(r.getLong(2) >= 1, "corpus has at least one language")
    val dup = r.getDouble(5)
    assert(dup >= 0.0 && dup < 1.0, s"dup rate $dup out of range")
    assert(r.getLong(6) > 0, "token estimate must be positive")
  }

  test("sentence stats: averages bounded by maxima, every text doc covered") {
    val rows = graft.operators.TextOps.textSentenceStats(spark, sfOracle)
      .collect()
    assert(rows.length == Tables.documents(spark, sfOracle)
      .filter(col("text").isNotNull).count())
    rows.foreach { r =>
      val (n, mx, avg) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(n >= 0 && mx >= 0 && avg >= 0)
      if (n > 0) {
        assert(avg <= mx + 1e-9, s"avg $avg above max $mx")
        assert(mx >= 1, "a non-empty sentence has at least one word")
      }
    }
  }

  test("quality gate: passed iff no reasons, rules re-derivable per document") {
    val rows = Pipeline.qualityGate(spark, sfOracle).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(1) == r.getString(2).isEmpty,
        s"passed flag must mirror empty reasons for doc ${r.getLong(0)}")
      val reasons = r.getString(2).split(",").filter(_.nonEmpty)
      assert(reasons.distinct.length == reasons.length)
      assert(reasons.forall(Set("too_short", "no_lang", "low_alpha",
        "repetitive").contains))
    }
    // the gate audits every doc with text — same universe as the scan
    assert(rows.length == Tables.documents(spark, sfOracle)
      .filter(col("text").isNotNull).count())
  }

  test("interpolate: observed days pass through, gaps stay inside anchor bounds") {
    val rows = Stats.timeseriesInterpolate(spark, sfOracle).collect()
    assert(rows.nonEmpty)
    // every filled value is non-null: the grid spans first..last
    // observed day, so an anchor always exists on at least one side
    assert(rows.forall(!_.isNullAt(2)))
    // cross-check one user against ffill's observed days: where
    // observed=true the two policies agree exactly (both pass through)
    val ff = Stats.timeseriesFfill(spark, sfOracle).collect()
      .filter(_.getBoolean(3)).map(r => (r.getLong(0), r.getDate(1).toString) -> r.getDouble(2)).toMap
    rows.filter(_.getBoolean(3)).foreach { r =>
      val k = (r.getLong(0), r.getDate(1).toString)
      assert(math.abs(ff(k) - r.getDouble(2)) < 1e-9,
        s"observed day diverges from ffill at $k")
    }
  }

  test("benjamini-hochberg: p_adj >= p, monotone in p-rank, bounded by 1") {
    val rows = Stats.statsBenjaminiHochberg(spark, sfOracle).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getDouble(4); val pa = r.getDouble(5)
      assert(p >= 0 && p <= 1 && pa <= 1.0 + 1e-9, s"p out of range: $p $pa")
      assert(pa >= p - 1e-6, s"adjusted p below raw p: $pa < $p")
      assert(r.getBoolean(6) == (pa <= 0.10), "significance flag mismatch")
    }
    // step-up property: sorting by raw p, adjusted p never decreases
    val byP = rows.sortBy(_.getDouble(4)).map(_.getDouble(5))
    assert(byP.sliding(2).forall(w => w.length < 2 || w(0) <= w(1) + 1e-6),
      "p_adj must be monotone in the p-value rank")
  }

  test("funnel time: converted subset of viewers, latency bounds ordered") {
    val r = Stats.eventFunnelTime(spark, sfOracle).head()
    val (nv, nc) = (r.getLong(0), r.getLong(1))
    assert(nv > 0 && nc <= nv)
    assert(math.abs(r.getDouble(2) - nc.toDouble / nv) < 1e-6)
    if (nc > 0) {
      assert(r.getLong(3) >= 0, "first purchase at/after first view")
      assert(r.getLong(3) <= r.getDouble(4) + 1e-9 &&
             r.getDouble(4) <= r.getLong(5) + 1e-9, "min <= avg <= max")
    }
  }

  test("repeat upsample: copies per doc equal the source's capped ceil factor") {
    val rows = Pipeline.repeatUpsample(spark, sfOracle).collect()
    val perDoc = rows.groupBy(_.getLong(0))
    val counts = Tables.documents(spark, sfOracle)
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val maxN = counts.values.max
    perDoc.foreach { case (_, copies) =>
      val src = copies.head.getString(1)
      val want = math.min(math.ceil(maxN.toDouble / counts(src)).toLong, 4L)
      assert(copies.length == want, s"source $src: ${copies.length} != $want")
      assert(copies.map(_.getLong(3)).sorted.sameElements(1L to want),
        "copy indices must be 1..n_copies")
    }
    // every document appears; the largest source is never repeated
    assert(perDoc.size == counts.values.sum)
  }

  test("seasonality: indices positive and weighted-mean to exactly 1 per type") {
    val rows = Stats.timeseriesSeasonality(spark, sfOracle).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      assert(rs.forall(_.getDouble(4) > 0), s"$t: non-positive index")
      assert(rs.map(_.getLong(1)).distinct.length == rs.length,
        s"$t: duplicate weekday rows")
      assert(rs.forall(r => r.getLong(1) >= 0 && r.getLong(1) <= 6))
      // Σ index·n_days / Σ n_days = 1 by construction (the overall
      // mean is the n_days-weighted mean of the weekday means)
      val w = rs.map(r => r.getDouble(4) * r.getLong(2)).sum /
              rs.map(_.getLong(2)).sum
      assert(math.abs(w - 1.0) < 1e-4, s"$t: weighted index mean $w != 1")
    }
  }

  test("theil-sen: pair count is C(days,2); slope robust to one outlier day") {
    val rows = Stats.statsTheilSen(spark, sfOracle).collect()
    assert(rows.nonEmpty)
    val nDays = Tables.events(spark, sfOracle)
      .filter(col("event_type").isNotNull)
      .select(col("event_type"), to_date(col("ts")).as("d")).distinct()
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val n = nDays(r.getString(0))
      assert(r.getLong(1) == n * (n - 1) / 2,
        s"${r.getString(0)}: pair count != C($n,2)")
    }
    // robustness: the median-of-slopes over a clean line with one wild
    // outlier still recovers the line's slope (OLS would not)
    import spark.implicits._
    val pts = ((0 until 20).map(i => ("t", i.toLong, 2.0 * i)) :+
               (("t", 20L, 1e6))).toDF("event_type", "x", "y")
    val pairs = pts.as("a").join(pts.as("b"),
        col("a.event_type") === col("b.event_type") &&
        col("a.x") < col("b.x"))
      .select(((col("b.y") - col("a.y")) /
        (col("b.x") - col("a.x")).cast("double")).as("slope"))
    val med = pairs.agg(expr("percentile(slope, 0.5)")).head().getDouble(0)
    assert(math.abs(med - 2.0) < 1e-9, s"outlier dragged the median slope: $med")
  }

  test("ngram novelty: earliest doc fully novel, novel counts partition the gram space") {
    val rows = TextOps.textNgramNovelty(spark, sfOracle).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1 && r.getLong(2) >= 0 &&
             r.getLong(2) <= r.getLong(1))
      assert(math.abs(r.getDouble(3) -
        r.getLong(2).toDouble / r.getLong(1)) < 1e-6)
    }
    // the first emitting doc owns every one of its grams
    val first = rows.minBy(_.getLong(0))
    assert(first.getLong(2) == first.getLong(1),
      "the earliest document must be 100% novel")
    // Σ n_novel = |distinct grams|: each gram is novel exactly once
    val distinctGrams = Tables.documents(spark, sfOracle)
      .filter(col("text").isNotNull)
      .select(explode(expr(
        """array_distinct(transform(sequence(1, greatest(size(split(text, ' ')) - 2, 0)),
          |  i -> concat_ws(' ', element_at(split(text, ' '), i),
          |       element_at(split(text, ' '), i + 1),
          |       element_at(split(text, ' '), i + 2))))""".stripMargin)).as("g"))
      .distinct().count()
    assert(rows.map(_.getLong(2)).sum == distinctGrams,
      "novel counts must partition the distinct gram universe")
  }

  test("spearman: distributed midranks equal the naive in-memory computation") {
    val rows = Stats.statsSpearman(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rho = r.getDouble(2)
      assert(rho >= -1.0 - 1e-9 && rho <= 1.0 + 1e-9, s"rho $rho out of range")
    }
    // ground truth: collect the raw pairs, midrank in memory, Pearson
    // over the ranks — the bucketed two-pass prefix must agree exactly
    val raw = Tables.lineitem(spark, sfSmoke)
      .select(col("l_returnflag"),
        round(col("l_quantity").cast("double"), 4),
        round(col("l_extendedprice").cast("double"), 4))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    def midrank(xs: Array[Double]): Map[Double, Double] = {
      val sorted = xs.sorted
      xs.distinct.map { v =>
        val lo = sorted.indexWhere(_ == v); val hi = sorted.lastIndexWhere(_ == v)
        v -> (lo + hi + 2) / 2.0  // 1-based average rank over the tie run
      }.toMap
    }
    val expect = raw.groupBy(_._1).map { case (f, rs) =>
      val rq = midrank(rs.map(_._2)); val rp = midrank(rs.map(_._3))
      val xs = rs.map(t => rq(t._2)); val ys = rs.map(t => rp(t._3))
      val n = xs.length.toDouble
      val (mx, my) = (xs.sum / n, ys.sum / n)
      val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val sx = math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum)
      val sy = math.sqrt(ys.map(y => (y - my) * (y - my)).sum)
      f -> cov / (sx * sy)
    }
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2) - expect(r.getString(0))) < 1e-6,
        s"${r.getString(0)}: distributed rho ${r.getDouble(2)} != " +
          s"naive ${expect(r.getString(0))}")
    }
  }

  test("rolling median: window never exceeds 7 days, median brackets within window") {
    val rows = Stats.timeseriesRollingMedian(spark, sfOracle).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(4) >= 1 && r.getLong(4) <= 7),
      "calendar RANGE frame holds at most 7 day rows")
    // per type: the median lies within [min, max] of the trailing week
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val byDay = rs.sortBy(_.getDate(1).toString)
      byDay.zipWithIndex.foreach { case (r, i) =>
        val d0 = r.getDate(1).toLocalDate
        val window = byDay.slice(math.max(0, i - 6), i + 1)
          .filter(x => !x.getDate(1).toLocalDate.isBefore(d0.minusDays(6)))
          .flatMap(x => if (x.isNullAt(2)) None else Some(x.getDouble(2)))
        if (window.nonEmpty && !r.isNullAt(3)) {
          val m = r.getDouble(3)
          assert(m >= window.min - 1e-6 && m <= window.max + 1e-6,
            s"median $m outside window bounds [${window.min}, ${window.max}]")
        }
      }
    }
  }

  test("cohens kappa: confusion partitions n; kappa <= observed agreement scale") {
    val r = Stats.statsCohensKappa(spark, sfOracle).head()
    val n = r.getLong(0)
    assert(n > 0)
    assert(r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4) == n,
      "the 2x2 confusion must partition the corpus")
    val (po, pe, k) = (r.getDouble(5), r.getDouble(6), r.getDouble(7))
    assert(po >= 0 && po <= 1 && pe > 0 && pe < 1)
    assert(k <= 1.0 + 1e-9, "kappa cannot exceed 1")
    assert(math.abs(k - (po - pe) / (1 - pe)) < 1e-5, "kappa formula mismatch")
  }

  test("length histogram: buckets are powers of two, masses total the corpus") {
    val rows = Pipeline.lengthHistogram(spark, sfOracle).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == (1L << r.getLong(0)), "min_len must be 2^bucket")
      assert(r.getLong(2) > 0 && r.getLong(3) >= r.getLong(2) * r.getLong(1),
        "bucket token mass must be at least n_docs * min_len")
    }
    assert(math.abs(rows.last.getDouble(4) - 1.0) < 1e-9,
      "cumulative token fraction must end at exactly 1")
    assert(rows.map(_.getDouble(4)).sliding(2)
      .forall(p => p.length < 2 || p(0) <= p(1)), "cum frac must be monotone")
    val totalDocs = Tables.documents(spark, sfOracle)
      .filter(col("text").isNotNull).count()
    assert(rows.map(_.getLong(2)).sum == totalDocs,
      "every non-empty doc lands in exactly one bucket")
  }

  test("levene: F non-negative, group accounting matches the anova frame") {
    val r = Stats.statsLevene(spark, sfOracle).head()
    assert(r.getLong(0) > 0 && r.getLong(1) >= 2)
    assert(r.getDouble(2) >= 0 && r.getDouble(3) > 0, "sums of squares sign")
    assert(r.getDouble(4) >= 0, "F statistic is a ratio of non-negatives")
    // same population as statsAnova: group count and n_total agree
    val a = Stats.statsAnova(spark, sfOracle).head()
    assert(r.getLong(0) == a.getLong(0) && r.getLong(1) == a.getLong(1),
      "levene and anova must see the same (n_total, k_groups)")
  }

  test("wilcoxon: rank sums partition n(n+1)/2, z matches the closed form") {
    val r = Stats.statsWilcoxonSignedRank(spark, sfOracle).head()
    val n = r.getLong(0)
    assert(n > 0)
    val (wp, wm) = (r.getDouble(1), r.getDouble(2))
    assert(wp >= 0 && wm >= 0)
    assert(math.abs(wp + wm - n * (n + 1) / 2.0) < 1e-6,
      "signed rank sums must partition the total rank mass")
    val z = (wp - n * (n + 1) / 4.0) /
      math.sqrt(n * (n + 1) * (2.0 * n + 1) / 24.0)
    assert(math.abs(r.getDouble(3) - z) < 1e-5, "z normal approximation")
  }

  test("mann-kendall: S bounded by the pair count, z sign follows S") {
    val rows = Stats.statsMannKendall(spark, sfOracle).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, s) = (r.getLong(1), r.getLong(2))
      assert(math.abs(s) <= n * (n - 1) / 2, "S cannot exceed the pair count")
      assert(r.getDouble(3) > 0, "tie-corrected variance must stay positive")
      val z = r.getDouble(4)
      assert(s.signum == 0 && z == 0.0 || s.signum == z.signum.toInt ||
             z == 0.0, s"z sign must follow S: s=$s z=$z")
    }
  }

  test("runs test: run count within [1, n], moments match the closed form") {
    val r = Stats.statsRunsTest(spark, sfOracle).head()
    val (np, nn, runs) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(np + nn > 0)
    assert(runs >= 1 && runs <= np + nn, "runs bounded by the sequence length")
    val e = 1.0 + 2.0 * np * nn / (np + nn)
    assert(math.abs(r.getDouble(3) - e) < 1e-5, "expected-runs closed form")
  }

  test("inter-arrival: gaps non-negative, moments ordered") {
    val rows = Stats.eventInterArrival(spark, sfOracle).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      val (avg, mn, mx) = (r.getDouble(2), r.getLong(4), r.getLong(5))
      assert(mn >= 0, "time is ordered within a user — gaps cannot be negative")
      assert(avg >= mn - 1e-6 && avg <= mx + 1e-6, "mean within extremes")
    }
  }

  test("time decay: decayed mass positive and below the raw count") {
    val rows = AdvancedAggs.aggTimeDecay(spark, sfOracle).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, dc) = (r.getLong(1), r.getDouble(2))
      assert(dc > 0 && dc <= n + 1e-6,
        s"${r.getString(0)}: decayed count $dc must lie in (0, $n]")
      // events span months, so decay must actually bite (not all weight 1)
      assert(dc < n, s"${r.getString(0)}: no event older than a week?")
    }
  }

  test("drawdown: non-negative, worst day inside the type's span") {
    val rows = Windows.winDrawdown(spark, sfOracle).collect()
    assert(rows.nonEmpty)
    val spans = Tables.events(spark, sfOracle)
      .filter(col("event_type").isNotNull)
      .groupBy("event_type")
      .agg(min(to_date(col("ts"))).as("d0"), max(to_date(col("ts"))).as("d1"))
      .collect().map(r => r.getString(0) -> (r.getDate(1), r.getDate(2))).toMap
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0, "drawdown is peak minus current: never negative")
      val (d0, d1) = spans(r.getString(0))
      val wd = r.getDate(3)
      assert(!wd.before(d0) && !wd.after(d1), "worst day outside the data span")
    }
  }

  test("feature hashing: dims bounded, counts total the word mass") {
    val rows = TextOps.textFeatureHashing(spark, sfOracle).collect()
    assert(rows.nonEmpty)
    val wordCounts = Tables.documents(spark, sfOracle)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val feats = r.getString(3).split(",").map { f =>
        val Array(d, c) = f.split(":"); (d.toLong, c.toLong)
      }
      assert(feats.forall { case (d, _) => d >= 0 && d < 64 },
        "hashed dims must land in [0, 64)")
      assert(feats.map(_._1).distinct.length == feats.length, "dims unique")
      assert(feats.map(_._1).sorted.sameElements(feats.map(_._1)),
        "serialization must be dim-ordered")
      assert(feats.map(_._2).sum == r.getLong(1), "counts total n_words")
      assert(feats.length == r.getLong(2).toInt)
      assert(r.getLong(1) == wordCounts(r.getLong(0)),
        "n_words must equal the doc's word count")
    }
  }

  test("substring shingles: exact-duplicate docs are 100% duplicated spans") {
    val rows = Dedup.dedupSubstringShingle(spark, sfOracle).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      val f = r.getDouble(3)
      assert(f >= 0.0 && f <= 1.0)
      assert(r.getBoolean(4) == (f >= 0.5))
    }
    // any two docs with identical text share every shingle: dup_frac 1
    val dupDocs = Tables.documents(spark, sfOracle)
      .filter(col("text").isNotNull && length(col("text")) >= 40)
      .groupBy(col("text")).agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(explode(col("ids")).as("doc_id"))
      .collect().map(_.getLong(0)).toSet
    if (dupDocs.nonEmpty) {
      val byId = rows.map(r => r.getLong(0) -> r.getDouble(3)).toMap
      dupDocs.foreach { id =>
        assert(byId(id) == 1.0,
          s"doc $id has an exact twin but dup_frac ${byId(id)} != 1.0")
      }
    }
  }

  test("readability: formula recomputes, bands consistent, syllables >= words' vowels") {
    val rows = TextOps.textReadability(spark, sfOracle).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, sn, sy) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(w >= 1 && sn >= 1 && sy >= 1)
      val f = 206.835 - 1.015 * w.toDouble / sn - 84.6 * sy.toDouble / w
      assert(math.abs(r.getDouble(4) - f) < 1e-3, "flesch closed form")
      val band = if (r.getDouble(4) >= 60) "easy"
        else if (r.getDouble(4) >= 30) "standard" else "difficult"
      assert(r.getString(5) == band, "band thresholds")
    }
  }

  test("proportion z-test (event grain): counts partition, rates bounded, z recomputes") {
    val r = Stats.statsProportionsZtest(spark, sfOracle)
      .filter(col("grain") === "event").head()
    val (na, nb, xa, xb) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(na > 0 && nb > 0 && xa <= na && xb <= nb)
    val total = Tables.events(spark, sfOracle)
      .filter(col("user_id").isNotNull && col("event_type").isNotNull).count()
    assert(na + nb == total, "arms must partition the filtered events")
    val (ra, rb) = (xa.toDouble / na, xb.toDouble / nb)
    assert(math.abs(r.getDouble(5) - ra) < 1e-6 &&
           math.abs(r.getDouble(6) - rb) < 1e-6)
    val p = (xa + xb).toDouble / (na + nb)
    val z = (ra - rb) / math.sqrt(p * (1 - p) * (1.0 / na + 1.0 / nb))
    assert(math.abs(r.getDouble(7) - z) < 1e-5, "pooled z closed form")
  }


  test("effect size: pooled sd between arm sds, |g| < |d|, formulas recompute") {
    val r = Stats.statsEffectSize(spark, sfOracle).head()
    val (na, nb) = (r.getLong(0), r.getLong(1))
    assert(na > 2 && nb > 2)
    val (va, vb, sd) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
    assert(sd >= math.sqrt(math.min(va, vb)) - 1e-6 &&
           sd <= math.sqrt(math.max(va, vb)) + 1e-6,
      "pooled sd must lie between the arm sds")
    val d = (r.getDouble(2) - r.getDouble(3)) / sd
    assert(math.abs(r.getDouble(7) - d) < 1e-4, "Cohen's d closed form")
    val g = r.getDouble(8)
    assert(math.abs(g) <= math.abs(r.getDouble(7)) + 1e-9,
      "the Hedges correction always shrinks |d|")
  }

  test("roc auc: in [0,1], equals the pairwise concordance probability") {
    val r = Stats.statsRocAuc(spark, sfOracle).head()
    val (np, nn, auc) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(np > 0 && nn > 0)
    assert(auc >= 0.0 && auc <= 1.0, s"auc $auc out of range")
    // ground truth on the smoke corpus: P(score+ > score-) + 0.5 ties
    val small = Tables.events(spark, sfSmoke)
      .filter(col("value").isNotNull && col("event_type").isNotNull)
      .select(round(col("value"), 4), (col("event_type") === "purchase"))
      .collect().map(x => (x.getDouble(0), x.getBoolean(1)))
    val pos = small.filter(_._2).map(_._1); val neg = small.filterNot(_._2).map(_._1)
    val conc = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum / (pos.length.toLong * neg.length)
    val smokeAuc = Stats.statsRocAuc(spark, sfSmoke).head().getDouble(2)
    assert(math.abs(smokeAuc - conc) < 1e-6,
      s"rank-formula AUC $smokeAuc != pairwise concordance $conc")
  }

  test("confusion metrics: counts partition, F1 is the P/R harmonic mean") {
    val r = Stats.statsConfusionMetrics(spark, sfOracle).head()
    val (tp, fp, fn, tn) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val total = Tables.events(spark, sfOracle)
      .filter(col("value").isNotNull && col("event_type").isNotNull).count()
    assert(tp + fp + fn + tn == total, "confusion cells partition the events")
    val (p, rec) = (r.getDouble(5), r.getDouble(6))
    assert(math.abs(r.getDouble(4) - (tp + tn).toDouble / total) < 1e-6)
    assert(math.abs(p - tp.toDouble / (tp + fp)) < 1e-6)
    assert(math.abs(rec - tp.toDouble / (tp + fn)) < 1e-6)
    assert(math.abs(r.getDouble(7) - 2 * p * rec / (p + rec)) < 1e-5)
  }

  test("ndcg: bounded by the ideal ordering, within [0,1]") {
    val rows = graft.operators.Similarity.statsNdcg(spark, sfOracle).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (dcg, idcg) = (r.getDouble(1), r.getDouble(2))
      assert(dcg >= -1e-9 && idcg > 0)
      assert(dcg <= idcg + 1e-6, "no ordering beats the ideal ordering")
      val n = r.getDouble(3)
      assert(n >= 0.0 && n <= 1.0 + 1e-9, s"ndcg $n out of range")
      assert(math.abs(n - dcg / idcg) < 1e-3, "ndcg = dcg/idcg")
    }
  }

  test("js divergence: within [0,1] bits, zero iff identical distribution") {
    val rows = TextOps.textJsDivergence(spark, sfOracle).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val j = r.getDouble(2)
      assert(j >= -1e-9 && j <= 1.0 + 1e-9, s"${r.getString(0)}: jsd $j out of range")
      assert(r.getLong(1) >= 1)
      // a real source is a strict subset of the corpus mix, never equal
      assert(j > 0, s"${r.getString(0)}: a proper sub-corpus cannot have JSD 0")
    }
  }

  test("char classes partition every document's characters") {
    val rows = TextOps.textCharClassProfile(spark, sfOracle).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, a, d, sp, sym) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(a + d + sp + sym == n, "classes must partition the char count")
      assert(a >= 0 && d >= 0 && sp >= 0 && sym >= 0)
      assert(math.abs(r.getDouble(6) - a.toDouble / n) < 1e-6)
      assert(math.abs(r.getDouble(7) - sym.toDouble / n) < 1e-6)
    }
  }

  test("cramers v: agrees with chi_square contributions, effect sizes in [0,1]") {
    val v = Stats.statsCramersV(spark, sfOracle).head()
    val chi2FromKey = Stats.statsChiSquare(spark, sfOracle)
      .agg(sum("chi2_contrib")).head().getDouble(0)
    // same contingency table → same χ² (contributions rounded at 6, so
    // the sum can drift by #cells·5e-7 at most)
    assert(math.abs(v.getDouble(3) - chi2FromKey) < 1e-3,
      s"cramers_v chi2 ${v.getDouble(3)} != chi_square key sum $chi2FromKey")
    val (cv, cvc, tt) = (v.getDouble(4), v.getDouble(5), v.getDouble(6))
    for (x <- Seq(cv, cvc, tt))
      assert(x >= 0 && x <= 1 + 1e-9, s"effect size $x out of [0,1]")
    // correction only shrinks; T ≤ V always (√(min−1) ≤ ⁴√((r−1)(c−1)))
    assert(cvc <= cv + 1e-9)
    assert(tt <= cv + 1e-9)
  }

  test("mutual info: H identities and 0 ≤ MI ≤ min(Hs, Hl)") {
    val r = Stats.statsMutualInfo(spark, sfOracle).head()
    val (hs, hl, hj, mi, nmi) = (r.getDouble(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(hs > 0 && hl > 0, "marginals are non-degenerate on this corpus")
    assert(hj <= hs + hl + 1e-9, "subadditivity H(X,Y) ≤ H(X)+H(Y)")
    assert(hj >= math.max(hs, hl) - 1e-9, "joint entropy dominates marginals")
    assert(mi >= -1e-9 && mi <= math.min(hs, hl) + 1e-9,
      s"MI $mi outside [0, min($hs, $hl)]")
    assert(nmi >= -1e-9 && nmi <= 1 + 1e-9)
    assert(math.abs(mi - (hs + hl - hj)) < 2e-6, "MI must equal Hs+Hl−Hj")
  }

  test("k-anonymity: report recomputes from the QI group frame") {
    val r = Pipeline.privacyKAnonymity(spark, sfOracle).head()
    val groups = Tables.events(spark, sfOracle)
      .filter(col("user_id").isNotNull && col("value").isNotNull
        && col("event_type").isNotNull)
      .groupBy(col("event_type"), floor(col("value") / 100), hour(col("ts")))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("s"))
      .collect()
    assert(r.getLong(0) == groups.map(_.getLong(3)).sum, "rows partition")
    assert(r.getLong(1) == groups.length, "group count")
    assert(r.getLong(2) == groups.map(_.getLong(3)).min, "min group size")
    assert(r.getLong(3) == groups.count(_.getLong(3) < 5), "k violations")
    assert(r.getLong(4) == groups.filter(_.getLong(3) < 5).map(_.getLong(3)).sum)
    assert(r.getLong(5) == groups.count(_.getLong(4) < 3), "l violations")
    assert(math.abs(r.getDouble(6) - r.getLong(4).toDouble / r.getLong(0)) < 1e-6)
    // the chosen QI grid must actually stress the gate on this corpus
    assert(r.getLong(3) > 0 && r.getLong(3) < r.getLong(1),
      "k-gate should neither pass everything nor suppress everything")
  }

  test("xi correlation: bounded, equals the naive tie-robust computation") {
    val rows = Stats.statsXiCorrelation(spark, sfOracle).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // ξ ∈ [−1/2 + O(1/n), 1]; n ≥ 2 for the statistic to exist
      assert(r.getLong(1) >= 2)
      assert(r.getDouble(2) >= -0.5 - 1e-9 && r.getDouble(2) <= 1.0 + 1e-9)
    }
    // recompute one type naively from the daily frame
    val t = rows.head.getString(0)
    val daily = Tables.events(spark, sfOracle)
      .filter(col("event_type") === t)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(round(sum(col("value")), 4).as("y"))
      .orderBy("d").collect().map(_.getDouble(1))
    val n = daily.length
    val rks = daily.map(yi => daily.count(_ <= yi).toLong)
    val ls = daily.map(yi => daily.count(_ >= yi).toLong)
    val num = rks.sliding(2).map(p => math.abs(p(1) - p(0))).sum
    val den = ls.map(l => l * (n - l)).sum
    val xi = 1.0 - n * num.toDouble / (2.0 * den)
    assert(math.abs(rows.head.getDouble(2) - xi) < 1e-6,
      s"type $t: distributed ξ ${rows.head.getDouble(2)} != naive $xi")
  }

  test("kendall tau-b: pair accounting closes, |tau| bounded by 1") {
    val rows = Stats.statsKendallTau(spark, sfOracle).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n0, nc, nd) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nc + nd <= n0, "concordant+discordant cannot exceed the pairs")
      assert(math.abs(r.getDouble(4)) <= 1.0 + 1e-9, s"tau_b out of [-1,1]")
      // n0 must be exactly C(days, 2) for this type
      val days = Tables.events(spark, sfOracle)
        .filter(col("event_type") === r.getString(0))
        .select(to_date(col("ts"))).distinct().count()
      assert(n0 == days * (days - 1) / 2, "pair space must be C(days,2)")
    }
  }

  test("compression ratio: executor bytes equal local deflate, bounds hold") {
    val rows = TextOps.textCompressionRatio(spark, sfOracle).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
      assert(math.abs(r.getDouble(3) -
        r.getLong(2).toDouble / r.getLong(1)) < 1e-6)
    }
    // word-soup docs from a small vocabulary must compress on average
    assert(rows.map(_.getDouble(3)).sum / rows.length < 1.0)
    // pin the executor path against a local recompute, and repetition
    // monotonicity: doc ⧺ doc (×8) compresses strictly better
    val texts = Tables.documents(spark, sfOracle)
      .filter(col("text").isNotNull).select("doc_id", "text")
      .orderBy("doc_id").limit(20).collect()
    def deflate(sIn: String): Long = {
      val d = new java.util.zip.Deflater(6)
      d.setInput(sIn.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      d.finish()
      val buf = new Array[Byte](1 << 16)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      d.end(); n
    }
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    texts.foreach { t =>
      val (id, txt) = (t.getLong(0), t.getString(1))
      val row = byId(id)
      assert(row.getLong(2) == deflate(txt),
        s"doc $id: executor deflate ${row.getLong(2)} != local ${deflate(txt)}")
      val rep = txt * 8
      assert(deflate(rep).toDouble / rep.getBytes("UTF-8").length <
        row.getDouble(3) + 1e-9,
        s"doc $id: 8x repetition must compress better")
    }
  }

  test("lang confusion: cells partition the corpus, shares close per row") {
    val cells = TextOps.textLangConfusion(spark, sfOracle).collect()
    val nDocs = Tables.documents(spark, sfOracle).count()
    assert(cells.map(_.getLong(2)).sum == nDocs, "cells must partition docs")
    cells.groupBy(_.getString(0)).foreach { case (lang, rows) =>
      val s = rows.map(_.getDouble(3)).sum
      assert(math.abs(s - 1.0) < 1e-4, s"$lang: shares sum to $s, not 1")
    }
    // diagonal agrees with the doc-grain lang-id key
    val correct = TextOps.textLangId(spark, sfOracle)
      .filter(col("actual_lang") === col("predicted")).count()
    assert(cells.filter(_.getBoolean(4)).map(_.getLong(2)).sum == correct)
  }

  test("ljung-box: Q recomputes from the textbook ACF (global-mean " +
      "autocovariance over variance) of the gap-filled daily series") {
    val lb = Stats.statsLjungBox(spark, sfOracle).collect()
      .map(r => r.getString(0) -> r).toMap
    val daily = Tables.events(spark, sfOracle)
      .filter(col("event_type").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("c")).collect()
      .groupBy(_.getString(0))
    daily.foreach { case (t, rows) =>
      val byDay = rows.map(r =>
        r.getDate(1).toLocalDate -> r.getLong(2).toDouble).toMap
      val (d0, d1) = (byDay.keys.min(Ordering.by[java.time.LocalDate, Long](
        _.toEpochDay)), byDay.keys.max(Ordering.by[java.time.LocalDate, Long](
        _.toEpochDay)))
      val xs = Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1))
        .map(d => byDay.getOrElse(d, 0.0)).toArray
      val n = xs.length
      val mean = xs.sum / n
      val xc = xs.map(_ - mean)
      val denom = xc.map(v => v * v).sum
      def rho(k: Int) = BigDecimal(
        (k until n).map(i => xc(i) * xc(i - k)).sum / denom)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (r1, r2, r3) = (rho(1), rho(2), rho(3))
      val q = n * (n + 2.0) *
        (r1 * r1 / (n - 1) + r2 * r2 / (n - 2) + r3 * r3 / (n - 3))
      val row = lb(t)
      assert(row.getLong(1) == n)
      assert(math.abs(row.getDouble(2) - q) < 1e-5,
        s"$t: Q ${row.getDouble(2)} != recomputed $q")
      assert(row.getBoolean(3) == (row.getDouble(2) > 7.814728))
      assert(row.getDouble(2) >= 0)
    }
  }

  test("snaive backtest: errors non-negative, scored days bounded by span") {
    val rows = Stats.timeseriesSnaiveBacktest(spark, sfOracle).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, mae, mape) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(n > 0 && mae >= 0 && mape >= 0)
      assert(math.abs(r.getDouble(4)) <= mae + 1e-9,
        "bias magnitude cannot exceed the MAE")
      // scored days are at most the type's observed days minus 7
      val days = Tables.events(spark, sfOracle)
        .filter(col("event_type") === r.getString(0))
        .select(to_date(col("ts"))).distinct().count()
      assert(n <= days - 7)
    }
  }

  test("stl: components reassemble to x, trend null exactly at edges") {
    val rows = Stats.timeseriesStlDecompose(spark, sfOracle).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (t, series) =>
      // first/last 3 observed days of each type have no full window
      val nullTrend = series.count(_.isNullAt(3))
      assert(nullTrend == math.min(6, series.length), s"$t: edge-null count")
      series.filter(r => !r.isNullAt(3)).foreach { r =>
        val (x, tr, se, res) = (r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5))
        // x = trend + seasonal + residual up to the three roundings
        assert(math.abs(x - (tr + se + res)) < 3e-6,
          s"$t @ ${r.getDate(1)}: components don't reassemble")
      }
      // seasonal must (approximately) center to zero across the series
      // zero by construction (seasonal = sraw − row-mean(sraw)), so only
      // the per-row rounding can move the mean
      val seas = series.filter(!_.isNullAt(4)).map(_.getDouble(4))
      assert(math.abs(seas.sum / seas.length) < 1e-5,
        s"$t: seasonal must center to zero")
    }
  }
}
