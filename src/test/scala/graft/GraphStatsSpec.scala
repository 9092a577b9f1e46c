package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graph, Pipeline, Sources, Stats}

/** Invariants for the round-7 continuation keys: graph kernels,
  * nonparametric stats, survival/EWMA time series, reservoir sampling,
  * curriculum bucketing, and the z-order sink. Each test asserts a
  * mathematical property the oracle hash cannot express (mass
  * conservation, monotonicity, bounds), so a representation-level change
  * that still hashes green cannot silently break the semantics.
  */
class GraphStatsSpec extends SparkSpecBase {

  test("pagerank: probability mass is conserved and top ranks positive") {
    val r = Graph.graphPagerank(spark, sfOracle)
    val rows = r.collect()
    assert(rows.length == 100)
    // every node has out-edges, so the damped walk conserves total mass;
    // the top-100 slice must carry a positive fraction of it
    assert(rows.forall(_.getDouble(1) > 0))
    assert(rows.map(_.getDouble(1)).sliding(2).forall(p => p(0) >= p(1)),
      "ranks must be emitted in non-increasing order")
  }

  test("pagerank: total rank over ALL nodes sums to 1") {
    // re-run the kernel without the top-100 cut by summing before limit:
    // mass conservation Σr = 1 holds at every iteration when no node
    // dangles — the bipartite undirected graph guarantees outdeg ≥ 1
    val li = Tables.lineitem(spark, sfSmoke)
      .select(concat(lit("p"), col("l_partkey")).as("p"),
              concat(lit("s"), col("l_suppkey")).as("q")).distinct()
    val edges = li.select(col("p").as("src"), col("q").as("dst"))
      .unionAll(li.select(col("q").as("src"), col("p").as("dst")))
    val weighted = edges
      .join(edges.groupBy(col("src")).agg(count(lit(1)).as("deg")), "src")
      .select(col("src"), col("dst"), (lit(1.0) / col("deg")).as("w"))
    val n = weighted.select("src").distinct().count()
    var ranks = weighted.select(col("src").as("node")).distinct()
      .withColumn("r", lit(1.0 / n))
    for (_ <- 1 to 3)
      ranks = weighted.join(ranks, col("src") === col("node"))
        .groupBy(col("dst").as("node"))
        .agg((lit(0.15 / n) + lit(0.85) * sum(col("r") * col("w"))).as("r"))
    val total = ranks.agg(sum("r")).head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9, s"rank mass $total != 1")
  }

  test("degree stats: node counts sum to side cardinality and shares to 1") {
    val r = Graph.graphDegreeStats(spark, sfSmoke).collect()
    val li = Tables.lineitem(spark, sfSmoke)
      .select("l_partkey", "l_suppkey").distinct()
    val nParts = li.select("l_partkey").distinct().count()
    val nSupps = li.select("l_suppkey").distinct().count()
    def tot(side: String) =
      r.filter(_.getString(0) == side).map(_.getLong(2)).sum
    assert(tot("part") == nParts && tot("supplier") == nSupps)
    // Σ degree·n_nodes per side = |E| (each edge counted once per side)
    val edges = li.count()
    def mass(side: String) =
      r.filter(_.getString(0) == side).map(x => x.getLong(1) * x.getLong(2)).sum
    assert(mass("part") == edges && mass("supplier") == edges)
    def shares(side: String) =
      r.filter(_.getString(0) == side).map(_.getDouble(3)).sum
    assert(math.abs(shares("part") - 1.0) < 1e-4)
    assert(math.abs(shares("supplier") - 1.0) < 1e-4)
  }

  test("recursive CTE: chain length is floor(log2(key)) for every supplier") {
    val r = operators.Relational.sqlRecursiveCte(spark, sfSmoke).collect()
    val n = Tables.supplier(spark, sfSmoke).count()
    assert(r.map(_.getLong(1)).sum == n, "every supplier walks one chain")
    // depth d covers keys [2^d, 2^(d+1)); depth 0 additionally holds
    // key 0 (the corpus keys start at 0, and 0's walk never steps)
    r.foreach { row =>
      val (d, lo, hi) = (row.getLong(0), row.getLong(2), row.getLong(3))
      val floor = if (d == 0) 0L else 1L << d
      assert(lo >= floor && hi < (2L << d),
        s"depth $d bracket [$lo,$hi] escapes [$floor, 2^${d + 1})")
    }
  }

  test("triangles: count is non-negative and bounded by edge triples") {
    val row = Graph.graphTriangles(spark, sfSmoke).head()
    val (e, t) = (row.getLong(0), row.getLong(1))
    assert(t >= 0 && e >= 0)
    // each triangle consumes 3 distinct oriented edges
    if (t > 0) assert(e >= 3)
  }

  test("ks test: D in [0,1] and arms partition the sample") {
    val row = Stats.statsKsTest(spark, sfOracle).head()
    val d = row.getDouble(2)
    assert(d >= 0.0 && d <= 1.0, s"KS D=$d out of [0,1]")
    assert(row.getLong(0) > 0 && row.getLong(1) > 0)
  }

  test("anova: F >= 0 and squared sums non-negative") {
    val row = Stats.statsAnova(spark, sfOracle).head()
    assert(row.getDouble(2) >= 0.0) // ss_between
    assert(row.getDouble(3) >= 0.0) // ss_within
    assert(row.getDouble(4) >= 0.0) // f_stat
  }

  test("autocorr: coefficients in [-1,1]") {
    val rows = Stats.statsAutocorr(spark, sfOracle).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq(2, 3, 4).foreach { i =>
        if (!r.isNullAt(i)) {
          val v = r.getDouble(i)
          assert(v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9, s"acf $v out of range")
        }
      }
    }
  }

  test("ewma: smoothed value stays within the series' running envelope") {
    val rows = Stats.timeseriesEwma(spark, sfOracle)
      .orderBy("event_type", "d").collect()
    // s_t is a convex combination of observed x's, so it can never
    // leave the [min, max] of the prefix
    rows.groupBy(_.getString(0)).values.foreach { series =>
      var lo = Double.MaxValue
      var hi = Double.MinValue
      series.sortBy(_.getDate(1).toString).foreach { r =>
        val x = r.getDouble(2); val e = r.getDouble(3)
        lo = math.min(lo, x); hi = math.max(hi, x)
        assert(e >= lo - 1e-6 && e <= hi + 1e-6,
          s"ewma $e escapes prefix envelope [$lo,$hi]")
      }
    }
  }

  test("mann-whitney: U within [0, na*nb]") {
    val row = Stats.statsMannWhitney(spark, sfOracle).head()
    val (na, nb, u) = (row.getLong(0), row.getLong(1), row.getDouble(2))
    assert(u >= -1e-6 && u <= na.toDouble * nb + 1e-6,
      s"U=$u outside [0, ${na.toDouble * nb}]")
  }

  test("survival km: S(t) non-increasing from <=1, risk set telescopes") {
    val rows = Stats.statsSurvivalKm(spark, sfOracle).collect()
    assert(rows.nonEmpty)
    var prev = 1.0 + 1e-9
    rows.foreach { r =>
      val sT = r.getDouble(3)
      assert(sT <= prev + 1e-9, s"S(t) increased: $sT > $prev")
      assert(sT >= -1e-9)
      prev = sT
    }
    // risk set at first t is the full user population
    val nUsers = Tables.events(spark, sfOracle)
      .filter(col("user_id").isNotNull)
      .select("user_id").distinct().count()
    assert(rows.head.getLong(2) == nUsers)
  }

  test("event attribution: credited conversions equal total purchases") {
    val attr = Stats.eventAttribution(spark, sfOracle)
      .agg(sum("conversions")).head().getLong(0)
    val purchases = Tables.events(spark, sfOracle)
      .filter(col("event_type") === "purchase" && col("user_id").isNotNull)
      .count()
    assert(attr == purchases, s"attributed $attr != purchases $purchases")
  }

  test("reservoir: exactly min(5, group size) rows per group, stable") {
    val a = Pipeline.sampleReservoirGroup(spark, sfOracle).collect()
    val b = Pipeline.sampleReservoirGroup(spark, sfOracle).collect()
    assert(a.toSeq == b.toSeq, "reservoir draw must be deterministic")
    val sizes = a.groupBy(_.getString(0)).view.mapValues(_.length)
    sizes.foreach { case (g, n) => assert(n <= 5, s"group $g drew $n > 5") }
  }

  test("curriculum: buckets 1..5, quintiles roughly balanced") {
    val rows = Pipeline.pipelineCurriculum(spark, sfOracle).collect()
    val byBucket = rows.groupBy(_.getLong(2)).view.mapValues(_.length).toMap
    assert(byBucket.keySet.subsetOf((1L to 5L).toSet))
    val n = rows.length
    byBucket.values.foreach(c =>
      assert(c >= n / 10 && c <= n / 2, s"bucket size $c wildly unbalanced"))
  }

  test("holt smoothing: seeds at (x1, 0), forecast decomposes as level + trend") {
    val rows = Stats.timeseriesHolt(spark, sfOracle).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getString(0))
    byType.values.foreach { series =>
      val first = series.minBy(r => r.getDate(1).toString)
      assert(first.getDouble(3) == first.getDouble(2), "l1 must equal x1")
      assert(first.getDouble(4) == 0.0, "b1 must be 0")
    }
    rows.foreach { r =>
      assert(math.abs(r.getDouble(5) - (r.getDouble(3) + r.getDouble(4))) < 2e-6,
        "forecast must be level + trend (within rounding)")
    }
  }

  test("connected components: labels are component minima, counts consistent, multi-hop chains collapse") {
    val rows = Graph.graphConnectedComponents(spark, sfOracle).collect()
    assert(rows.length ==
      Tables.documents(spark, sfOracle).count(), "one row per document")
    val byComp = rows.groupBy(_.getLong(1))
    byComp.foreach { case (lbl, ms) =>
      assert(ms.map(_.getLong(0)).min == lbl,
        s"component label $lbl must be its min member id")
      ms.foreach(r => assert(r.getLong(2) == ms.length,
        s"n_members mismatch in component $lbl"))
    }
    // the point of the key vs dedup_cluster: true multi-hop chains —
    // at least one component must be larger than a single pair
    assert(byComp.values.exists(_.length > 2),
      "expected a multi-hop (>2 member) near-dup chain in the corpus")
  }

  test("zorder: round-trip preserves rows and files cluster both keys") {
    val out = Sources.sinkZorderLayout(spark, sfOracle)
    val n = out.count()
    val expected = Tables.lineitem(spark, sfOracle)
      .filter(col("l_partkey") < 200 && col("l_suppkey") < 50).count()
    assert(n == expected, s"z-order round trip lost rows: $n != $expected")
    // z-value must equal the reference interleave for a planted pair:
    // bits of 5 (101) at even positions, bits of 3 (011) at odd
    val z = spark.range(1).selectExpr(
      """aggregate(sequence(0, 15), 0L, (acc, i) ->
           acc + shiftleft(shiftright(5L, i) & 1L, 2 * i)
               + shiftleft(shiftright(3L, i) & 1L, 2 * i + 1))""")
      .head().getLong(0)
    // interleave(x=5,y=3): x bits -> 1,0,1 at 2i; y bits -> 1,1 at 2i+1
    // = (1<<0)+(1<<4) + (1<<1)+(1<<3) = 1+16+2+8 = 27
    assert(z == 27L, s"morton(5,3)=$z != 27")
  }

  test("bfs: level profile starts at one source and is a contiguous prefix") {
    val rows = Graph.graphBfsDistance(spark, sfOracle).collect()
    assert(rows.nonEmpty, "bfs reached no nodes")
    assert(rows.head.getLong(0) == 0L && rows.head.getLong(1) == 1L,
      "level 0 must hold exactly the source")
    // synchronous BFS cannot skip a level: emitted dists are 0,1,2,…
    rows.map(_.getLong(0)).zipWithIndex.foreach { case (d, i) =>
      assert(d == i.toLong, s"level gap: dist $d at position $i")
    }
    assert(rows.forall(_.getLong(1) >= 1))
    // reached set is bounded by the co-purchase node universe
    val li = Tables.lineitem(spark, sfOracle)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val nodes = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p"), col("b.p")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .select(explode(array(col("a.p"), col("b.p"))).as("n"))
      .distinct().count()
    assert(rows.map(_.getLong(1)).sum <= nodes,
      "bfs reached more nodes than the graph holds")
  }

  test("jaccard neighbors: scores in (0,1], non-increasing, common>=1") {
    val rows = Graph.graphJaccardNeighbors(spark, sfOracle).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pair must be oriented a<b")
      assert(r.getLong(2) >= 1, "pairs need a common neighbor")
      val j = r.getDouble(3)
      assert(j > 0.0 && j <= 1.0, s"jaccard $j out of range")
    }
    assert(rows.map(_.getDouble(3)).sliding(2)
      .forall(p => p.length < 2 || p(0) >= p(1)),
      "top-k must be emitted in non-increasing score order")
  }

  test("kcore: peel profile monotone non-increasing, survivors have degree >= 2") {
    val rows = Graph.graphKcore(spark, sfOracle).collect()
    assert(rows.length == 4, "exactly four peel rounds")
    assert(rows.map(_.getLong(0)).sameElements(1L to 4L))
    val nodes = rows.map(_.getLong(1)); val edges = rows.map(_.getLong(2))
    assert(nodes.sliding(2).forall(p => p(0) >= p(1)),
      "peeling can only shrink the node set")
    assert(edges.sliding(2).forall(p => p(0) >= p(1)),
      "peeling can only shrink the edge set")
    // round i+1's keep-filter sees round i's FILTERED adjacency, so the
    // next node count is bounded by nodes that could still have degree
    // >= 2 there: n_{i+1} <= min(n_i, e_i) (degree sum = 2e, deg >= 2
    // per survivor => survivors <= e)
    (0 until 3).foreach { i =>
      assert(nodes(i + 1) <= math.min(nodes(i), edges(i)),
        s"round ${i + 2}: ${nodes(i + 1)} survivors exceed the degree bound " +
          s"min(${nodes(i)}, ${edges(i)})")
    }
  }

  test("adamic-adar: scores positive, bounded by common/ln(2), ordered") {
    val rows = Graph.graphAdamicAdar(spark, sfOracle).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pairs oriented a<b")
      val (common, score) = (r.getLong(2), r.getDouble(3))
      assert(common >= 1)
      assert(score > 0.0, "a shared neighbor always contributes")
      // every contribution is 1/ln(deg) with deg >= 2
      assert(score <= common / math.log(2.0) + 1e-6,
        s"score $score exceeds the ln(2) bound for $common common neighbors")
    }
    assert(rows.map(_.getDouble(3)).sliding(2)
      .forall(p => p.length < 2 || p(0) >= p(1)), "descending score order")
  }

  test("modularity: Q within [-0.5,1], contributions consistent, labels are minima") {
    val rows = Graph.graphModularity(spark, sfOracle).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val q = rows.head.getDouble(5)
    assert(rows.forall(_.getDouble(5) == q), "global Q repeats on every row")
    assert(q >= -0.5 - 1e-9 && q <= 1.0 + 1e-9, s"modularity $q out of range")
    rows.foreach { r =>
      // a community's internal edges cannot exceed half its degree mass
      assert(r.getLong(2) * 2 <= r.getLong(3),
        s"community ${r.getLong(0)}: internal ${r.getLong(2)} vs degree ${r.getLong(3)}")
      // the label is the smallest node id in the community, hence a member
      assert(r.getLong(1) >= 1)
    }
    // sizes emitted in non-increasing order with the lab tie-break
    assert(rows.map(_.getLong(1)).sliding(2)
      .forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("assortativity: coefficient within [-1,1], edge count matches triangles' frame") {
    val r = Graph.graphAssortativity(spark, sfOracle).head()
    assert(r.getLong(0) > 0)
    val a = r.getDouble(1)
    assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9, s"correlation $a out of range")
  }

  test("random walk: one walk per node, strict bipartite alternation, real edges") {
    val rows = Graph.graphRandomWalk(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).distinct.length == rows.length,
      "exactly one walk per start node")
    // part↔supplier bipartite ⇒ labels must alternate p/s every hop
    rows.foreach { r =>
      val path = (0 to 4).map(i => r.getString(i).charAt(0))
      path.sliding(2).foreach(p =>
        assert(p(0) != p(1), s"walk ${r.getString(0)} broke bipartiteness"))
    }
    // spot-check: every traversed step is a real edge of the graph
    val li = Tables.lineitem(spark, sfSmoke)
      .select(col("l_partkey").cast("long"), col("l_suppkey").cast("long"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.take(50).foreach { r =>
      (0 until 4).foreach { i =>
        val (a, b) = (r.getString(i), r.getString(i + 1))
        val (pLab, sLab) = if (a.startsWith("p")) (a, b) else (b, a)
        assert(li.contains((pLab.drop(1).toLong, sLab.drop(1).toLong)),
          s"walk step $a → $b is not an edge")
      }
    }
  }

  test("label propagation: communities are real nodes, sizes ordered, deterministic, fixpoint-consistent") {
    val rows = Graph.graphLabelPropagation(spark, sfSmoke).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val sizes = rows.map(_.getLong(1))
    assert(sizes.forall(_ >= 1))
    // output ordering contract: size desc, community asc on ties
    rows.sliding(2).foreach { p =>
      if (p.length == 2)
        assert(p(0).getLong(1) > p(1).getLong(1) ||
          (p(0).getLong(1) == p(1).getLong(1) &&
           p(0).getLong(0) < p(1).getLong(0)))
    }
    // every community label is a real node id of the co-purchase graph
    val items = Tables.lineitem(spark, sfSmoke)
      .select(col("l_partkey").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    rows.foreach(r => assert(items.contains(r.getLong(0)),
      s"community ${r.getLong(0)} is not a part node"))
    val again = Graph.graphLabelPropagation(spark, sfSmoke).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(1))).toSeq,
      "LPA with sync rounds + min-label ties must be deterministic")
  }

  test("conversion windows: monotone in the window, bounded by total conversions") {
    val r = Stats.eventConversionWindow(spark, sfSmoke).collect()(0)
    val (nv, nc, c1, c24, c7d) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))
    assert(nv > 0 && nc <= nv)
    assert(c1 <= c24 && c24 <= c7d && c7d <= nc,
      "a wider window can only add conversions, all bounded by untimed total")
    assert(math.abs(r.getDouble(5) - c1.toDouble / nv) <= 1e-6)
    assert(math.abs(r.getDouble(7) - c7d.toDouble / nv) <= 1e-6)
  }

  test("hits: max-normalized scores in (0,1], exactly one 1.0 per side, degree seeds authorities") {
    val rows = Graph.graphHits(spark, sfSmoke).collect()
    assert(rows.length == 20)
    for (side <- Seq("authority", "hub")) {
      val ss = rows.filter(_.getString(0) == side)
      assert(ss.length == 10)
      assert(ss.map(_.getLong(3)).sameElements(1L to 10L))
      val scores = ss.map(_.getDouble(2))
      assert(scores.forall(x => x > 0.0 && x <= 1.0))
      assert(scores.max == 1.0, s"$side max must normalize to exactly 1.0")
      assert(scores.sliding(2).forall(p => p(0) >= p(1)),
        s"$side scores must be rank-ordered")
    }
    val again = Graph.graphHits(spark, sfSmoke).collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ==
      again.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq)
  }

  test("holt-winters: seed week consumed, forecast decomposes as level + trend + season(t-6)") {
    val rows = Stats.timeseriesHoltWinters(spark, sfSmoke)
      .filter(col("event_type") === "purchase").collect()
    assert(rows.nonEmpty)
    val nDays = Tables.events(spark, sfSmoke)
      .filter(col("event_type") === "purchase")
      .select(to_date(col("ts"))).distinct().count()
    assert(rows.length == nDays - 7, "every day past the seed week emits")
    // rows are day-ordered; row i (0-based) is t = i + 8. For t >= 14 the
    // season the forecast adds (s_{t-6}) is the seasonal emitted 6 rows
    // earlier — the recursion's cross-row identity, exact up to the
    // 1e-6 output rounding of the four reported values
    rows.indices.drop(6).foreach { i =>
      val r = rows(i)
      val sLag = rows(i - 6).getDouble(5)
      assert(math.abs(r.getDouble(6) - (r.getDouble(3) + r.getDouble(4) + sLag))
        <= 4e-6, s"forecast must equal level+trend+season(t-6) at row $i")
    }
    val again = Stats.timeseriesHoltWinters(spark, sfSmoke)
      .filter(col("event_type") === "purchase").collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("peak concurrency: matches a driver-side brute-force sweep, day totals consistent") {
    val out = Stats.eventPeakConcurrency(spark, sfSmoke).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    // brute-force replay: collect the session intervals (bounded at this
    // SF) and sweep them in scala — per-day peaks must agree exactly
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val sess = Tables.events(spark, sfSmoke)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("gap_sec",
        col("ts").cast("long") - lag(col("ts"), 1).over(w).cast("long"))
      .withColumn("new_s",
        when(col("gap_sec").isNull || col("gap_sec") > 1800, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(w))
      .groupBy(col("user_id"), col("sid"))
      .agg(unix_micros(min(col("ts"))).as("st"),
           unix_micros(max(col("ts"))).as("en"))
      .select("st", "en").collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = (sess.map(s => (s._1, 1L)) ++ sess.map(s => (s._2 + 1, -1L)))
      .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).sum) }
      .toArray.sortBy(_._1)
    var run = 0L
    val peaks = scala.collection.mutable.Map.empty[String, Long]
    edges.foreach { case (k, net) =>
      run += net
      val d = java.time.Instant.ofEpochSecond(k / 1000000)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
      peaks(d) = math.max(peaks.getOrElse(d, Long.MinValue), run)
    }
    out.foreach { case (d, peak, nStarted) =>
      assert(peaks(d) == peak, s"day $d: engine peak $peak != swept ${peaks(d)}")
      assert(peak >= 1 || nStarted == 0)
    }
    assert(out.map(_._3).sum == sess.length,
      "per-day session starts must total the session count")
  }

  test("rich club: club is nonempty and strictly high-degree, density " +
      "ratio consistent with the reported densities") {
    val r = graft.operators.Graph.graphRichClub(spark, sfSmoke).collect()(0)
    assert(r.getAs[Long]("n_rich") > 0)
    assert(r.getAs[Long]("n_rich") < r.getAs[Long]("n_nodes"),
      "a p90 threshold cannot admit every node")
    assert(r.getAs[Long]("n_edges_rich") <= r.getAs[Long]("n_edges_sym"))
    val ratio = r.getAs[Double]("rich_club_ratio")
    assert(!ratio.isNaN && ratio >= 0.0)
    assert(math.abs(ratio - r.getAs[Double]("density_rich") /
      r.getAs[Double]("density_all")) <= 1e-4)
  }
}
