package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deduplication operators for LLM training-data pipelines: exact,
  * MinHash+LSH, SimHash, and exact n-gram Jaccard.
  *
  * Scale design: nothing here ever forms an unblocked pair space.
  *  - exact dedup: one hash-groupBy (shuffle on the content hash);
  *  - MinHash: candidate pairs come only from LSH band buckets — the
  *    join key is (band, band_hash), so the shuffle is proportional to
  *    the number of colliding docs, not n²;
  *  - SimHash / Jaccard: pairs are blocked on `source` (a real pipeline
  *    blocks on shard/domain); an unblocked variant is the LSH one.
  */
object Dedup {

  private def ws = array_distinct(split(col("text"), " "))

  /** Exact duplicate elimination on the order-insensitive bag-of-words
    * hash (the corpus plants word-permuted duplicates: same word set,
    * different order). Keep-first = min doc_id per group. */
  def dedupExact(s: SparkSession, sf: String): DataFrame =
    Tables.documents(s, sf)
      .select(col("doc_id"),
        md5(concat_ws(" ", array_sort(ws)).cast("binary")).as("h"))
      .groupBy("h")
      .agg(min(col("doc_id")).as("keep_id"),
           count(lit(1)).as("n_copies"))
      .orderBy("h")

  /** MinHash + LSH near-duplicate candidates.
    *
    * 16 hash functions (xxhash64 with the function index as an extra
    * hashed column = a seeded family), signature = per-function min over
    * the word set; 4 LSH bands of 4 rows each. Docs sharing any band
    * hash become candidates; estimated Jaccard = fraction of matching
    * signature components. Oracle-N (hash family is engine-specific);
    * the spec plants known near-dup pairs and checks the estimate
    * against exact Jaccard. */
  def dedupNearMinhash(s: SparkSession, sf: String): DataFrame =
    minhashPairs(Tables.documents(s, sf).select(col("doc_id"), ws.as("ws")))
      .orderBy(col("est_jaccard").desc, col("id1"), col("id2"))

  /** Max docs per LSH bucket before the bucket is skipped as a "stop
    * bucket" (the LSH analog of stopword removal). Unbounded buckets are
    * the one way LSH goes quadratic — a bucket of b docs emits b²/2
    * pairs, so capping b bounds the pair space at any corpus size. */
  private val MaxBucket = 64

  /** Core MinHash pipeline over (doc_id, ws: array<string>) — shared with
    * the fixture-based spec.
    *
    * Shape: signatures are computed ONCE per doc (cached column, not
    * re-derived per band), buckets are formed by groupBy — not a
    * self-join — and pairs are generated inside each bucket with a
    * bounded nested transform. Oversized buckets are dropped (see
    * MaxBucket); with a healthy shingle space they do not occur. */
  private[graft] def minhashPairs(docs: DataFrame): DataFrame = {
    graft.functions.MinHashSig16.register(docs.sparkSession)
    val sig = docs
      // native one-pass signature (graft.functions.MinHashSig16) — equals
      // transform(sequence(0,15), s -> array_min(transform(ws, w -> xxhash64(w, s))))
      .withColumn("sig", expr("graft_minhash16(ws)"))
      .select(col("doc_id"), col("sig"))
    val bands = sig.select(col("doc_id"), col("sig"),
        explode(expr(
          """transform(sequence(0, 3), b -> struct(b AS band,
            |  xxhash64(element_at(sig, b*4+1), element_at(sig, b*4+2),
            |           element_at(sig, b*4+3), element_at(sig, b*4+4)) AS bh))"""
            .stripMargin)).as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band"), col("bb.bh"))
    val buckets = bands
      .groupBy(col("band"), col("bh"))
      .agg(expr("sort_array(collect_list(struct(doc_id, sig)))").as("members"))
      .filter(size(col("members")).between(2, MaxBucket))
    buckets
      .select(explode(expr(
        """flatten(transform(members, (m1, i) ->
          |  transform(slice(members, i + 2, size(members)), m2 ->
          |    struct(m1.doc_id AS id1, m2.doc_id AS id2,
          |      size(filter(zip_with(m1.sig, m2.sig, (a, b) -> a = b),
          |           x -> x)) AS n_eq))))""".stripMargin)).as("p"))
      .select(col("p.id1"), col("p.id2"),
              round(col("p.n_eq").cast("double") / 16.0, 4).as("est_jaccard"))
      .distinct()
  }

  /** Max members per SimHash band bucket. Buckets are (source, band,
    * 12-bit band value); one over the cap is skipped as a stop bucket —
    * the same guard as MaxBucket above. Band-value collisions need
    * near-identical signatures, so real corpora stay far below this. */
  private val SimhashMaxBucket = 4096

  /** SimHash near-dup detection: 48-bit signature (bit j = sign of the
    * sum of ±1 votes from each word-hash's j-th bit), pairs within the
    * same source at Hamming distance ≤ 3. Oracle-N (engine hash).
    *
    * Scale shape: the signature splits into 4 bands of 12 bits; by
    * pigeonhole, Hamming ≤ 3 flips at most 3 bands, so every qualifying
    * pair matches EXACTLY on at least one band — banding loses nothing.
    * Candidates therefore come from groupBy buckets keyed on
    * (source, band, band value), not a per-source self-join: the pair
    * space is Σ bucket², bounded by band-value occupancy (and the stop
    * bucket cap), not by per-source corpus size. Signatures are computed
    * once per doc in a single lineage — no self-join, nothing persisted. */
  def dedupSimhash(s: SparkSession, sf: String): DataFrame = {
    graft.functions.SimHash48.register(s)
    val sigs = Tables.documents(s, sf)
      .select(col("doc_id"), col("source"),
        // word hashes via built-in xxhash64, signature via the native
        // codegen expression (graft.functions.SimHash48) — the
        // interpreted two-level HOF formulation was the bench bottleneck
        expr("graft_simhash48(transform(array_distinct(split(text, ' ')), w -> xxhash64(w)))")
          .as("simhash"))
    val buckets = sigs
      .select(col("source"), col("doc_id"), col("simhash"),
              explode(expr("sequence(0, 3)")).as("band"))
      .withColumn("bv", expr("shiftright(simhash, band * 12) & 4095"))
      .groupBy(col("source"), col("band"), col("bv"))
      .agg(expr("sort_array(collect_list(struct(doc_id, simhash)))").as("members"))
      .filter(size(col("members")).between(2, SimhashMaxBucket))
    buckets
      .select(col("source"), explode(expr(
        """flatten(transform(members, (m1, i) ->
          |  transform(slice(members, i + 2, size(members)), m2 ->
          |    struct(m1.doc_id AS id1, m2.doc_id AS id2,
          |      bit_count(m1.simhash ^ m2.simhash) AS hamming))))"""
          .stripMargin)).as("p"))
      .select(col("source"), col("p.id1"), col("p.id2"), col("p.hamming"))
      .filter(col("hamming") <= 3)
      .distinct()  // a pair can match on up to 4 bands
      .orderBy("source", "id1", "id2")
  }

  /** Stop-bucket cap for the Jaccard prefix-token buckets (same guard as
    * MaxBucket). A bucket is (source, one prefix token); in a real
    * Zipfian corpus prefix tokens are the RAREST tokens of each doc
    * (smallest hash ≈ random rare word), so occupancy stays low. */
  private val JaccardMaxBucket = 4096

  /** Exact word-set (1-gram) Jaccard near-dup pairs, blocked on source,
    * J ≥ 0.9. Fully oracle-checkable — DuckDB computes the same
    * intersection/union arithmetic with list functions.
    *
    * Scale shape — prefix filtering (the ppjoin/AllPairs bound): under
    * any fixed global token order, two sets with J ≥ t must share at
    * least one token among each set's first n − ⌈t·n⌉ + 1 sorted
    * elements. Candidates therefore come from groupBy buckets keyed on
    * (source, prefix token) — at t = 0.9 the prefix is ~n/10 tokens, so
    * each doc lands in a handful of buckets and the pair space is
    * Σ bucket², not per-source n². Exact Jaccard then verifies every
    * candidate, so the result is identical to the all-pairs form. */
  def dedupNgramJaccard(s: SparkSession, sf: String): DataFrame = {
    // hash words to 64-bit longs before pairing: buckets then move and
    // intersect fixed-width longs instead of strings — same intersection
    // cardinality (collision odds ~n²/2^64), same Jaccard. Sorted once
    // per doc so the per-pair intersect is a linear merge.
    graft.functions.SortedIntersectSize.register(s)
    val docs = Tables.documents(s, sf)
      .select(col("doc_id"), col("source"),
              expr("array_sort(transform(array_distinct(split(text, ' ')), w -> xxhash64(w)))")
                .as("ws"),
              size(ws).as("n"))
    val buckets = docs
      .select(col("source"), col("doc_id"), col("ws"), col("n"),
        explode(expr(
          "slice(ws, 1, size(ws) - CAST(ceil(0.9D * size(ws)) AS INT) + 1)"))
          .as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(expr("sort_array(collect_list(struct(doc_id, ws, n)))").as("members"))
      .filter(size(col("members")).between(2, JaccardMaxBucket))
    buckets
      .select(col("source"), explode(expr(
        """flatten(transform(members, (m1, i) ->
          |  transform(slice(members, i + 2, size(members)), m2 ->
          |    struct(m1.doc_id AS id1, m2.doc_id AS id2,
          |      m1.ws AS w1, m1.n AS n1, m2.ws AS w2, m2.n AS n2))))"""
          .stripMargin)).as("p"))
      .select(col("source"), col("p.id1"), col("p.id2"),
              col("p.w1"), col("p.n1"), col("p.w2"), col("p.n2"))
      // size prefilter: J ≥ 0.9 implies max(n1,n2) ≤ 1.11·min(n1,n2) —
      // a pure subset optimization (result-identical, oracle unchanged)
      // that skips the expensive intersect for most candidates
      .filter(greatest(col("n1"), col("n2")) <=
              least(col("n1"), col("n2")) * 1.12)
      .withColumn("n_inter", expr("graft_sorted_intersect_size(w1, w2)"))
      .withColumn("jac", round(col("n_inter").cast("double") /
        (col("n1") + col("n2") - col("n_inter")), 6))
      .filter(col("jac") >= 0.9)
      .select("source", "id1", "id2", "jac")
      .distinct()  // a pair can share several prefix tokens
      .orderBy("source", "id1", "id2")
  }
}
