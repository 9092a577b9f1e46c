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

  test("bucketed-table reuse rejects a different input with the same row count") {
    // the round-3 advice hazard: a caller passing DIFFERENT data of equal
    // cardinality must re-bucket, never silently join stale contents
    val n = Tables.nation(spark, sfSmoke)
      .select(col("n_nationkey").as("k"), col("n_name").as("v"))
    val first = ScalePatterns.bucketedCoLocatedJoin(
      spark, n, n, "k", 4, "t_fp_left", "t_fp_right")
    assert(first.count() == 25)
    // same schema, same 25 rows, different contents (shifted keys)
    val shifted = n.withColumn("k", col("k") + 1000)
    try {
      val second = ScalePatterns.bucketedCoLocatedJoin(
        spark, shifted, shifted, "k", 4, "t_fp_left", "t_fp_right")
      val keys = second.select("k").collect()
        .map(_.getAs[Number](0).longValue)
      assert(keys.nonEmpty && keys.forall(_ >= 1000),
        "reuse guard served stale table contents for a different input")
    } finally Seq("t_fp_left", "t_fp_right").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("dedup/similarity candidate joins stay hash-shaped (no unbounded nested-loop)") {
    // the scale rewrites' whole point: candidate generation must plan as
    // equi hash/sort-merge joins on bucket keys, never cartesian or an
    // UNBOUNDED broadcast-nested-loop — guard against a refactor
    // reintroducing one. The r8 in-plan knob derivation legitimately
    // adds broadcast-SCALAR crossJoins (1-row keys=[] aggregates — the
    // repo's q2-style pattern), which also print as
    // BroadcastNestedLoopJoin; the precise invariant is that every
    // IdentityBroadcastMode exchange broadcasts a scalar aggregate
    // (exactly 1 row by construction), so any nested loop is 1×n.
    val plans = Seq(
      "dedup_simhash" -> operators.Dedup.dedupSimhash(spark, sfSmoke),
      "jaccard_prefix" -> operators.Dedup.ngramJaccardPrefixJoin(
        operators.Dedup.jaccardDocs(spark, sfSmoke)),
      "sim_knn_join" -> operators.Similarity.simKnnJoin(spark, sfSmoke),
      "dedup_embed_cosine" -> operators.Similarity.dedupEmbedCosine(spark, sfSmoke),
      "dedup_incremental_bloom" -> operators.Dedup.dedupIncrementalBloom(spark, sfSmoke))
    for ((name, df) <- plans) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name must not plan a cartesian product:\n$plan")
      // tree print order: an exchange's child is the next line, so every
      // non-equi broadcast must sit directly over a keys=[] aggregate
      val lines = plan.linesIterator.toSeq
      val identityIdx = lines.zipWithIndex
        .filter(_._1.contains("BroadcastExchange IdentityBroadcastMode"))
        .map(_._2)
      assert(identityIdx.forall(i =>
          i + 1 < lines.length && lines(i + 1).contains("HashAggregate(keys=[]")),
        s"$name: non-equi broadcast over a non-scalar subtree (unbounded " +
          s"nested loop):\n$plan")
      val bnlj = lines.count(_.contains("BroadcastNestedLoopJoin"))
      assert(bnlj <= identityIdx.length,
        s"$name: a nested-loop join without a scalar broadcast:\n$plan")
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

  test("salted join equals plain join exactly and spreads rows within a key") {
    val li = Tables.lineitem(spark, sfSmoke)
    val pt = Tables.part(spark, sfSmoke)
    val salted = ScalePatterns.saltedJoin(li, pt, "l_partkey", "p_partkey", 8,
        struct(col("l_orderkey"), col("l_linenumber")))
      .select("l_orderkey", "l_linenumber", "p_partkey")
    val plain = li.join(pt, li("l_partkey") === pt("p_partkey"))
      .select("l_orderkey", "l_linenumber", "p_partkey")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // within a multi-row join key, the salt must VARY (hashing the key
    // itself would pin every hot-key row to one reducer)
    val spread = li.withColumn("__salt",
        pmod(xxhash64(struct(col("l_orderkey"), col("l_linenumber"))), lit(8)))
      .groupBy("l_partkey")
      .agg(countDistinct("__salt").as("n_salts"), count(lit(1)).as("n"))
      .filter(col("n") >= 16)
      .agg(min("n_salts")).head().getLong(0)
    assert(spread > 4, s"16+-row keys should spread over >4 of 8 salts, got $spread")
  }

  test("AQE splits a skewed join partition (skew=true in final plan)") {
    import spark.implicits._
    // 90% of left rows share one hot key; thresholds lowered so local
    // data volumes trigger the same re-planning a hot key does at scale
    val conf = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = (1 to 50000).map(i =>
        (if (i % 10 == 0) i.toLong % 100 else 7L, s"payload_$i"))
        .toDF("k", "v")
      val right = (0L to 99L).map(k => (k, s"dim_$k")).toDF("k", "w")
      val joined = left.join(right.hint("shuffle_hash"), "k")
      // materialize THIS QueryExecution — AQE finalizes (and annotates
      // skew) only on the executed plan instance, not on a fresh one
      assert(joined.collect().length == 50000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected AQE skew-join split in final plan:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom join: might_contain guards the probe scan, " +
      "SortMergeJoin above, result equals the plain join") {
    val df = ScalePatterns.joinRuntimeBloom(spark, sfSmoke)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"runtime bloom filter must reach the probe side:\n$plan")
    assert(plan.contains("bloom_filter_agg"),
      s"build side must aggregate the key set into a bloom:\n$plan")
    assert(plan.contains("SortMergeJoin"),
      s"the demo regime disables broadcast; expected SMJ:\n$plan")
    // the filter must sit on the LINEITEM (probe) scan side, i.e. on
    // l_orderkey — pruning before the shuffle, not after the join
    assert(plan.linesIterator.exists(l =>
        l.contains("might_contain") && l.contains("l_orderkey")),
      s"bloom must prune on the probe key:\n$plan")
    val expected = Tables.lineitem(spark, sfSmoke)
      .join(Tables.orders(spark, sfSmoke)
              .filter(col("o_orderpriority") === "1-URGENT"),
            col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
           round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
             .as("urgent_revenue"))
      .orderBy("l_returnflag").collect()
    val got = df.collect()
    assert(got.length == expected.length && got.nonEmpty)
    got.zip(expected).foreach { case (a, b) => assert(a == b) }
  }

  test("dpp join: the fact scan carries a dynamicpruning PartitionFilter " +
      "and the result equals the plain rollup") {
    val df = ScalePatterns.joinDppPrune(spark, sfSmoke)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"fact scan must be pruned by a runtime partition filter:\n$plan")
    assert(plan.linesIterator.exists(l =>
        l.contains("PartitionFilters") && l.contains("dynamicpruning")),
      s"the pruning must land in PartitionFilters (file skipping), " +
        s"not a data filter:\n$plan")
    val expected = Tables.events(spark, sfSmoke)
      .withColumn("d", to_date(col("ts")))
      .filter(dayofweek(col("d")).isin(1, 7))
      .groupBy(col("d"))
      .agg(count(lit(1)).as("n_events"),
           round(sum(col("value")), 4).as("revenue"))
      .orderBy("d").collect()
    val got = df.collect()
    assert(got.length == expected.length && got.nonEmpty)
    got.zip(expected).foreach { case (a, b) => assert(a == b) }
  }

  test("session warehouse is process-private, never the shared cwd default") {
    // persistBucketed drop-and-rebuilds tables by NAME in the session
    // warehouse; Spark's default ./spark-warehouse is shared by every
    // JVM launched from the repo root, and two concurrent graft
    // processes (e.g. the suite beside a Verify dump) race on the same
    // table directories — observed as RelationalSpec failing only under
    // a concurrent gate run. Every harness builder must therefore point
    // spark.sql.warehouse.dir at Scratch.warehouseDir (per-process,
    // deleted at exit); this pins the suite's own session to it.
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    assert(!wh.stripSuffix("/").endsWith("/spark-warehouse"),
      s"suite session uses the shared cwd-default warehouse: $wh")
    assert(wh.contains("graft_warehouse_"),
      s"suite session warehouse is not Scratch.warehouseDir: $wh")
  }
}
