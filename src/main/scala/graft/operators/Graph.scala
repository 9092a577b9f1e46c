package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Iterative / combinatorial graph analytics over relations — PageRank
  * and triangle counting, the two canonical "not just SQL" distributed
  * graph kernels, expressed as join+aggregate algebra so Catalyst (AQE,
  * broadcast selection, partial aggregation) still plans every step.
  * The graph is derived from `lineitem`: who-supplies-what is a natural
  * bipartite part↔supplier graph, and parts co-purchased in one order
  * form the co-occurrence graph — both reproducible in ANSI SQL, so the
  * kernels stay oracle-paired despite being iterative.
  */
object Graph {

  /** PageRank (damping 0.85, 3 synchronous iterations, uniform init)
    * over the undirected part↔supplier bipartite graph; emits the
    * top-100 nodes by rounded rank. Fixed iteration count keeps the
    * result closed-form — the oracle unrolls the same three steps as
    * chained CTEs, so an ITERATIVE distributed kernel is still
    * hash-checked exactly.
    *
    * Scale shape: the edge list with per-source weight (1/outdeg) is
    * computed ONCE and cached — each iteration then joins the
    * node-grain ranks frame in BROADCAST (ranks ≪ edges always: it
    * shrinks data to one row per node), and the per-dst sum partial-
    * aggregates MAP-SIDE before its exchange, so the only per-iteration
    * shuffle carries node-grain partials, never the edge frame. At
    * 100 TB ranks may outgrow a broadcast; the fallback is a shuffle
    * hash join against an edge cache pre-partitioned on src (one
    * node-grain shuffle per iteration, edges still shuffled once at
    * build). Every node has outdegree ≥ 1 by construction (undirected
    * edges), so no dangling-mass correction term is needed; top-100 is
    * distributed TakeOrderedAndProject, never a global sort.
    */
  def graphPagerank(s: SparkSession, sf: String): DataFrame = {
    val li = Tables.lineitem(s, sf)
      .select(concat(lit("p"), col("l_partkey")).as("p"),
              concat(lit("s"), col("l_suppkey")).as("q"))
      .distinct()
    val edges = li.select(col("p").as("src"), col("q").as("dst"))
      .unionAll(li.select(col("q").as("src"), col("p").as("dst")))
    val weighted = edges
      .join(edges.groupBy(col("src")).agg(count(lit(1)).as("deg")), "src")
      .select(col("src"), col("dst"), (lit(1.0) / col("deg")).as("w"))
      .cache()
    val nodes = weighted.select(col("src").as("node")).distinct()
    // node count stays IN-PLAN (broadcast scalar, the repo's q2-style
    // pattern) — no driver-side count() action before the real work
    var ranks = nodes.crossJoin(broadcast(nodes.agg(count(lit(1)).as("nn"))))
      .select(col("node"), (lit(1.0) / col("nn")).as("r"), col("nn"))
    for (_ <- 1 to 3) {
      ranks = weighted.join(broadcast(ranks), col("src") === col("node"))
        .groupBy(col("dst").as("node"))
        .agg(((lit(0.15) / max(col("nn"))) +
              lit(0.85) * sum(col("r") * col("w"))).as("r"),
             max(col("nn")).as("nn"))
    }
    ranks
      .select(col("node"), round(col("r"), 6).as("rank"))
      .orderBy(col("rank").desc, col("node").asc)
      .limit(100)
  }

  /** Triangle census of the co-purchase graph: parts are linked when
    * they appear in ≥ 2 distinct common orders (the support threshold
    * that separates signal from basket noise — and bounds the edge
    * set), and triangles are counted by the standard oriented
    * edge-edge-edge join (a < b < c, each edge checked once).
    *
    * Scale shape: pair generation is blocked per order (Σ basket²,
    * never global n²); the support filter then shrinks edges by an
    * order of magnitude before the only superlinear step. The triangle
    * join is two hash joins over the ORIENTED edge list — orientation
    * (src < dst) both deduplicates and caps the join fan-out by
    * out-degree; with D the max oriented degree, work is O(|E|·D), the
    * node-iterator bound. Skewed hubs: orientation already assigns a
    * hub's triangles to its smaller neighbors; residual skew is AQE's
    * to split.
    */
  def graphTriangles(s: SparkSession, sf: String): DataFrame = {
    val items = Tables.lineitem(s, sf)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val edges = items.as("a").join(items.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("u"), col("b.p").as("v"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2)
      .select(col("u"), col("v"))
      .cache()
    val tri = edges.as("e1")
      .join(edges.as("e2"), col("e1.v") === col("e2.u"))
      .join(edges.as("e3"),
        col("e1.u") === col("e3.u") && col("e2.v") === col("e3.v"))
      .agg(count(lit(1)).as("n_triangles"))
    edges.agg(count(lit(1)).as("n_edges"))
      .crossJoin(tri)
      .select(col("n_edges"), col("n_triangles"))
  }
}
