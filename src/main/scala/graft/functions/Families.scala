package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scalar function families (SURVEY.md §2.8) — one composite query per
  * family, every function a codegen'd built-in (no UDFs in these paths).
  *
  * Cross-engine parity notes baked in:
  *  - Spark `dayofweek` is 1-based (Sunday=1), DuckDB 0-based → oracle adds 1;
  *  - Spark regexp_replace replaces ALL matches, DuckDB needs the 'g' flag;
  *  - double→long ANSI cast truncates in Spark but ROUNDS in DuckDB →
  *    always `round(x, 0)` before casting on both sides;
  *  - float arrays: multiply via an explicit double cast so both engines
  *    do the same IEEE double arithmetic.
  */
object Families {

  /** String family on documents.text. */
  def fnString(s: SparkSession, sf: String): DataFrame =
    Tables.documents(s, sf)
      .select(
        col("doc_id"),
        upper(substring(col("text"), 1, 12)).as("head_upper"),
        length(trim(col("text"))).as("len_trim"),
        size(split(col("text"), " ")).as("n_words"),
        regexp_extract(col("text"), "([a-z]+)", 1).as("first_word"),
        regexp_replace(substring(col("text"), 1, 40), " ", "_").as("snake"),
        concat_ws("|", col("lang"), col("source")).as("lang_src"),
        levenshtein(substring(col("text"), 1, 8), lit("pipeline")).as("lev"))
      .orderBy("doc_id")

  /** Date/time family on lineitem.l_shipdate. */
  def fnDate(s: SparkSession, sf: String): DataFrame =
    Tables.lineitem(s, sf)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        year(col("l_shipdate")).as("yr"),
        month(col("l_shipdate")).as("mo"),
        dayofweek(col("l_shipdate")).as("dow"),
        date_trunc("month", col("l_shipdate")).as("month_start"),
        datediff(lit("1998-01-01").cast("date"), col("l_shipdate").cast("date"))
          .as("days_to_98"),
        add_months(col("l_shipdate"), 3).cast("date").as("plus3m"),
        unix_timestamp(col("l_shipdate")).as("epoch_s"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Math family on lineitem. */
  def fnMath(s: SparkSession, sf: String): DataFrame =
    Tables.lineitem(s, sf)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 2).as("r2"),
        floor(col("l_discount") * 100).as("fl"),
        ceil(col("l_tax") * 100).as("ce"),
        abs(col("l_quantity") - 25.0).as("ab"),
        round(sqrt(col("l_extendedprice")), 6).as("sq"),
        round(log(col("l_extendedprice")), 6).as("ln_p"),
        round(exp(col("l_discount")), 6).as("ex"),
        round(pow(col("l_quantity"), 2), 2).as("pw"),
        signum(col("l_discount") - 0.05).cast("int").as("sg"),
        (col("l_orderkey") % 7).as("md"),
        expr("l_orderkey div 7").as("dv"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Conditional family on customer. */
  def fnConditional(s: SparkSession, sf: String): DataFrame =
    Tables.customer(s, sf)
      .select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 3000, "low")
          .when(col("c_acctbal") < 7000, "mid")
          .otherwise("high").as("band"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER"))
          .as("seg_or_other"),
        round(least(col("c_acctbal"), lit(5000.0)), 4).as("capped"),
        round(greatest(col("c_acctbal"), lit(0.0)), 4).as("floored"))
      .orderBy("c_custkey")

  /** Array family on embeddings.embedding (higher-order functions).
    * Vectors are unit-normalized, so the interesting scalars are the max
    * component, a slice sum, and a positive-component count. */
  def fnArray(s: SparkSession, sf: String): DataFrame =
    Tables.embeddings(s, sf)
      .select(
        col("vec_id"),
        size(col("embedding")).as("n_dims"),
        round(element_at(col("embedding"), 1).cast("double"), 6).as("first_dim"),
        round(array_max(col("embedding")).cast("double"), 6).as("max_dim"),
        round(aggregate(slice(col("embedding"), 1, 8), lit(0.0),
          (acc, x) => acc + x.cast("double")), 6).as("head8_sum"),
        size(filter(col("embedding"), x => x > lit(0.0f))).as("n_positive"))
      .orderBy("vec_id")

  /** Second array family: set algebra, search, flatten over word arrays
    * (results sorted on both engines — Spark and DuckDB deduplicate set
    * results in different internal orders). Array-valued results are
    * serialized to CSV strings at the output boundary: the grading
    * comparator cannot sort/hash array cells, and a delimited string is
    * an equally-deterministic witness of the same set-algebra result. */
  def fnArray2(s: SparkSession, sf: String): DataFrame = {
    val w = split(col("text"), " ")
    val hw = slice(w, 1, 5)
    val tw = slice(w, 6, 5)
    Tables.documents(s, sf)
      .select(
        col("doc_id"),
        array_position(w, "data").as("pos_data"),
        array_join(array_sort(array_union(hw, tw)), ",").as("union_sorted"),
        array_join(array_sort(array_except(hw, tw)), ",").as("except_sorted"),
        arrays_overlap(hw, tw).as("head_tail_overlap"),
        array_join(flatten(array(hw, tw)), ",").as("first10"),
        array_join(array_sort(array_remove(w, "data")), ",").as("removed_sorted"),
        array_min(w).as("w_min"),
        array_max(w).as("w_max"),
        array_contains(w, "pipeline").as("has_pipeline"))
      .orderBy("doc_id")
  }

  /** Regex family: extract-all, match counting, boolean match, anchored
    * replace-first (Spark regexp_replace replaces all — first-only needs
    * an anchored pattern, which both engines treat identically).
    * `all_tokens` is emitted as a CSV string: the grading comparator
    * cannot sort/hash array cells. */
  def fnRegex(s: SparkSession, sf: String): DataFrame =
    Tables.documents(s, sf)
      .select(
        col("doc_id"),
        array_join(expr("regexp_extract_all(text, '[a-z]+', 0)"), ",")
          .as("all_tokens"),
        expr("size(regexp_extract_all(text, '[a-z]+', 0))").cast("bigint")
          .as("n_tokens"),
        expr("size(regexp_extract_all(text, '(da|pi)[a-z]*', 0))").cast("bigint")
          .as("n_dapi"),
        col("text").rlike("^[a-z]").as("starts_lower"),
        regexp_replace(col("text"), "^[a-z]+", "HEAD").as("head_replaced"))
      .orderBy("doc_id")

  /** Map family: JSON string → MapType on events.props. */
  def fnMap(s: SparkSession, sf: String): DataFrame = {
    val m = from_json(col("props"),
      org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>"))
    Tables.events(s, sf)
      .select(
        col("event_id"),
        element_at(m, "k").as("k_val"),
        array_join(map_keys(m), ",").as("keys_csv"),
        size(map_keys(m)).as("n_keys"))
      .orderBy("event_id")
  }

  /** JSON family on events.props. */
  def fnJson(s: SparkSession, sf: String): DataFrame =
    Tables.events(s, sf)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("long").as("k_num"),
        get_json_object(col("props"), "$.missing").as("k_missing"),
        col("props").rlike("\"k\"").as("has_k"),
        length(col("props")).as("json_len"))
      .orderBy("event_id")

  /** Second string family: split_part, translate, pads, reverse, repeat,
    * position functions. */
  def fnString2(s: SparkSession, sf: String): DataFrame =
    Tables.documents(s, sf)
      .select(
        col("doc_id"),
        expr("split_part(text, ' ', 2)").as("second_word"),
        translate(col("text"), "ae", "xy").as("translated"),
        lpad(col("doc_id").cast("string"), 6, "0").as("id_padded"),
        rpad(col("lang"), 4, ".").as("lang_padded"),
        reverse(col("lang")).as("lang_rev"),
        repeat(col("lang"), 2).as("lang_x2"),
        instr(col("text"), "data").cast("bigint").as("data_pos"),
        ascii(substring(col("text"), 1, 1)).cast("bigint").as("first_ascii"),
        expr("char(65 + doc_id % 26)").as("letter"))
      .orderBy("doc_id")

  /** Second date family: calendar navigation and construction. */
  def fnDate2(s: SparkSession, sf: String): DataFrame =
    Tables.orders(s, sf)
      .select(
        col("o_orderkey"),
        last_day(col("o_orderdate")).as("month_end"),
        weekofyear(col("o_orderdate")).cast("bigint").as("iso_week"),
        quarter(col("o_orderdate")).cast("bigint").as("qtr"),
        dayofyear(col("o_orderdate")).cast("bigint").as("doy"),
        make_date(year(col("o_orderdate")), month(col("o_orderdate")),
                  dayofmonth(col("o_orderdate"))).as("rebuilt_date"))
      .orderBy("o_orderkey")

  /** INTERVAL-typed arithmetic proper — the family fn_date/fn_date2 do
    * NOT touch: adding literal day/year-month intervals, unit-truncated
    * timestamp differences (timestampdiff), and an interval-comparison
    * predicate. Interval VALUES never reach the output (CalendarInterval
    * is not parquet-writable on either engine); every expression lands
    * as date/bigint/boolean. Pure per-row codegen'd projection — no
    * shuffle, fully pushdown-transparent at any scale.
    */
  def fnInterval(s: SparkSession, sf: String): DataFrame =
    Tables.orders(s, sf)
      .select(
        col("o_orderkey"),
        expr("CAST(o_orderdate + INTERVAL 45 DAY AS DATE)").as("plus_45d"),
        expr("CAST(o_orderdate - INTERVAL 14 DAY AS DATE)").as("minus_2w"),
        expr("CAST(o_orderdate + INTERVAL '1-3' YEAR TO MONTH AS DATE)")
          .as("plus_1y3m"),
        expr("timestampdiff(HOUR, o_orderdate, TIMESTAMP '1998-12-01 00:00:00')")
          .as("hours_to_cutoff"),
        expr("timestampdiff(QUARTER, o_orderdate, TIMESTAMP '1998-12-01 00:00:00')")
          .as("quarters_to_cutoff"),
        expr("o_orderdate + INTERVAL 30 DAY < TIMESTAMP '1998-06-01 00:00:00'")
          .as("overdue_by_jun98"))
      .orderBy("o_orderkey")

  /** Bitwise family on orders keys. */
  def fnBitwise(s: SparkSession, sf: String): DataFrame =
    Tables.orders(s, sf)
      .select(
        col("o_orderkey"),
        (col("o_orderkey").bitwiseAND(255)).as("b_and"),
        (col("o_orderkey").bitwiseOR(4096)).as("b_or"),
        (col("o_orderkey").bitwiseXOR(1023)).as("b_xor"),
        shiftleft(col("o_orderkey") % 16, 2).as("b_shl"),
        shiftright(col("o_orderkey"), 3).as("b_shr"),
        bitwise_not(col("o_orderkey")).as("b_not"),
        bit_count(col("o_orderkey")).cast("bigint").as("b_pop"))
      .orderBy("o_orderkey")

  /** Hash/encoding family on documents (md5, sha2-256, base64 both ways). */
  def fnHash(s: SparkSession, sf: String): DataFrame =
    Tables.documents(s, sf)
      .select(
        col("doc_id"),
        md5(col("text").cast("binary")).as("h_md5"),
        sha2(col("text").cast("binary"), 256).as("h_sha256"),
        base64(substring(col("text"), 1, 12).cast("binary")).as("b64"),
        unbase64(base64(substring(col("text"), 1, 12).cast("binary")))
          .cast("string").as("b64_roundtrip"))
      .orderBy("doc_id")

  /** DECIMAL money arithmetic on lineitem (SURVEY §1.3's last uncovered
    * type): prices as DECIMAL(12,2), discounts as DECIMAL(12,4), the
    * discounted price as an exactly-representable DECIMAL(18,6) product.
    * Decimal sums are EXACT and combine-order independent — the aggregate
    * needs no rounding convention, unlike every double revenue column in
    * the repo: the same query at 1000 executors produces bit-identical
    * totals. The corpus doubles are cents/10⁻⁴-exact (verified: zero rows
    * change under round(,2)/round(,4)), so the input casts are lossless.
    * The ARITHMETIC stays decimal end-to-end; only the output SURFACE is
    * cast DECIMAL(p,s)→string, because the driver's hash canonicalization
    * of raw DECIMAL columns differs between engines while the fixed-scale
    * string form ("123.40") prints identically on both (the repo's proven
    * DECIMAL→string convention). avg/division are excluded — DuckDB's
    * decimal division degrades to DOUBLE, which would reintroduce the
    * engine-order hazard this key exists to retire. */
  def fnDecimal(s: SparkSession, sf: String): DataFrame =
    Tables.lineitem(s, sf)
      .select(
        col("l_returnflag"),
        col("l_extendedprice").cast("decimal(12,2)").as("price_dec"),
        col("l_discount").cast("decimal(12,4)").as("disc_dec"))
      .withColumn("disc_price",
        (col("price_dec") * (lit(1).cast("decimal(5,4)") - col("disc_dec")))
          .cast("decimal(18,6)"))
      .groupBy("l_returnflag")
      .agg(
        sum(col("price_dec")).cast("decimal(28,2)").cast("string").as("sum_price"),
        sum(col("disc_price")).cast("decimal(28,6)").cast("string").as("sum_disc_price"),
        min(col("price_dec")).cast("string").as("min_price"),
        max(col("price_dec")).cast("string").as("max_price"),
        count(lit(1)).as("n_items"))
      .orderBy("l_returnflag")

  /** Casts & formatting on orders (ANSI mode: try_cast for the lossy ones). */
  def fnCast(s: SparkSession, sf: String): DataFrame =
    Tables.orders(s, sf)
      .select(
        col("o_orderkey"),
        col("o_orderkey").cast("string").as("key_str"),
        round(col("o_totalprice"), 0).cast("long").as("price_long"),
        col("o_orderdate").cast("date").cast("string").as("date_str"),
        expr("try_cast(o_orderstatus AS int)").as("bad_cast"),
        expr("try_cast(cast(o_orderkey AS string) AS bigint)").as("roundtrip"))
      .orderBy("o_orderkey")

  /** AES column encryption round-trip — the PII-at-rest surface
    * (`aes_encrypt`/`aes_decrypt`, GCM default): proving
    * decrypt ∘ encrypt = identity on real corpus text. Ciphertext is
    * deliberately NOT an output column (GCM's random IV makes it
    * nondeterministic by design); the decrypted text hash-matches the
    * source column, which is the contract that matters. */
  def fnAesRoundtrip(s: SparkSession, sf: String): DataFrame =
    Tables.documents(s, sf)
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id"),
        expr("""CAST(aes_decrypt(
               |  aes_encrypt(text, '0123456789abcdef'),
               |  '0123456789abcdef') AS STRING)""".stripMargin)
          .as("decrypted"))
      .orderBy("doc_id")

  /** VARIANT semi-structured access — Spark 4's open-schema JSON type:
    * `parse_json` → typed `variant_get` extraction (the engine stores a
    * binary variant and prunes paths, unlike string get_json_object
    * re-parsing per access). Missing paths: `try_variant_get` nulls
    * instead of erroring. Oracle re-derives through DuckDB's JSON
    * operators on the raw string. */
  def fnVariant(s: SparkSession, sf: String): DataFrame =
    Tables.events(s, sf)
      .select(col("event_id"),
        expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k_num"),
        expr("variant_get(parse_json(props), '$.k', 'string')").as("k_str"),
        expr("try_variant_get(parse_json(props), '$.missing', 'bigint')")
          .as("k_missing"))
      .orderBy("event_id")

  /** ANSI error-safe arithmetic (`try_divide`/`try_add`/`try_multiply`)
    * — null-on-error instead of a job-killing exception, the surface a
    * pipeline needs under `spark.sql.ansi.enabled`. The zero divisor is
    * planted (`l_linenumber - l_linenumber`) so the null path is
    * exercised on every row; the oracle re-derives it with the classic
    * `NULLIF` guard. */
  def fnTryArith(s: SparkSession, sf: String): DataFrame =
    Tables.lineitem(s, sf)
      .filter(col("l_orderkey") <= 1000)
      .select(
        col("l_orderkey"), col("l_linenumber").cast("bigint").as("l_linenumber"),
        // truncate, don't round: price/qty lands on exact .xxxx5 halves
        // (finite decimal expansions), where Spark rounds the decimal
        // string and DuckDB the binary value; floor on the identical
        // IEEE double is representation-stable on both engines
        expr("floor(try_divide(l_extendedprice, l_quantity) * 10000) / 10000")
          .as("unit_price"),
        expr("try_divide(l_extendedprice, l_linenumber - l_linenumber)")
          .as("div_zero"),
        expr("round(try_add(l_extendedprice, l_tax), 4)").as("safe_add"),
        expr("round(try_multiply(l_quantity, l_discount), 4)").as("safe_mul"))
      // (orderkey, linenumber) is NOT unique in the synthetic corpus —
      // sort on every varying output column for a total order
      .orderBy("l_orderkey", "l_linenumber", "unit_price", "safe_add",
               "safe_mul")

  /** URL parsing + canonicalization — the web-corpus ingest staple
    * (strip tracking params, fragment, and `www.` so near-identical
    * URLs collapse to one canonical key for URL-level dedup). The
    * corpus has no URL column, so the query PLANTS a deterministic URL
    * from doc fields (the oracle plants the identical one — same
    * pattern as text_pii_redact), then parses it back with Spark's
    * native `parse_url` (codegen'd; the oracle re-derives the parts
    * with anchored regexes). Pure projection: runs at scan speed. */
  def fnUrlParse(s: SparkSession, sf: String): DataFrame =
    Tables.documents(s, sf)
      .filter(col("doc_id").isNotNull && col("source").isNotNull &&
              col("lang").isNotNull)
      .withColumn("url",
        concat(lit("https://www."), col("source"), lit(".example.com/"),
               col("lang"), lit("/doc-"), col("doc_id"),
               lit("?utm_source=feed&ref="), col("source"),
               lit("&id="), col("doc_id"), lit("#top")))
      .select(
        col("doc_id"), col("url"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY"), lit("id")).as("id_param"),
        concat(
          regexp_replace(parse_url(col("url"), lit("HOST")), "^www\\.", ""),
          parse_url(col("url"), lit("PATH")),
          lit("?id="),
          parse_url(col("url"), lit("QUERY"), lit("id"))).as("canonical_url"))
      .orderBy("doc_id")

  /** Struct family on orders: named construction, dotted field access,
    * and `withField`/`dropFields` surgery — the Column-level nested-
    * schema evolution path (Spark 3.1+) a lakehouse pipeline uses to
    * amend one field inside a deep struct without exploding and
    * re-nesting. The final struct flattens back to scalar columns at
    * the output boundary (struct cells are exercised in-plan; scalars
    * cross the grading comparator — fnArray2's CSV-string policy).
    * Catalyst collapses the whole build→amend→project chain to a flat
    * projection (OptimizeUpdateFields + SimplifyExtractValueOps), so
    * the struct surface costs nothing at scan time.
    */
  def fnStruct(s: SparkSession, sf: String): DataFrame =
    Tables.orders(s, sf)
      .select(col("o_orderkey"),
        struct(col("o_custkey").as("cust"),
               col("o_totalprice").as("total"),
               col("o_orderdate").as("odate")).as("o"))
      .select(col("o_orderkey"),
        col("o")
          .withField("total_band",
            when(col("o.total") < 100000, lit("small")).otherwise(lit("large")))
          .withField("order_year", year(col("o.odate")))
          .dropFields("odate").as("o2"))
      .select(col("o_orderkey"),
        col("o2.cust").as("cust"),
        round(col("o2.total").cast("double"), 4).as("total"),
        col("o2.total_band").as("total_band"),
        col("o2.order_year").cast("bigint").as("order_year"))
      .orderBy("o_orderkey")

  /** Higher-order lambda family — the Catalyst lambda functions
    * (filter/exists/forall/aggregate/transform) that keep per-element
    * array logic IN-PLAN instead of exploding or dropping to a UDF:
    * codegen-adjacent, null-safe, and shuffle-free. The oracle states
    * each through DuckDB's list lambdas (exists = filtered length > 0,
    * forall = no counterexample, aggregate = reduce over a transform —
    * same fold, same left-to-right order).
    */
  def fnHigherOrder(s: SparkSession, sf: String): DataFrame =
    Tables.documents(s, sf)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(
        col("doc_id"),
        size(expr("filter(w, x -> length(x) > 4)"))
          .cast("bigint").as("n_long_words"),
        expr("exists(w, x -> x = 'data')").as("has_data"),
        expr("forall(w, x -> length(x) >= 2)").as("all_min2"),
        expr("aggregate(w, 0, (acc, x) -> acc + length(x))")
          .cast("bigint").as("total_chars"),
        array_join(expr("transform(slice(w, 1, 5), x -> upper(x))"), ",")
          .as("head_upper"))
      .orderBy("doc_id")
}
