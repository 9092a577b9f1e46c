package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic scale-up corpus generator for the scaling probe (r11
  * verdict ask #1): writes a `mult`× copy of a base corpus to a scratch
  * directory so per-key scaling exponents can be MEASURED instead of
  * argued from plan shapes. /root/testdata is never touched — output
  * goes wherever the caller points (tools/scale_probe.sh uses /tmp).
  *
  * Construction: `mult` key-shifted copies of every fact table, unioned.
  * The design preserves the properties that make the timing comparison
  * honest:
  *  - FK graphs replicate as disjoint copies (every key column shifts by
  *    the same copy stride), so join fan-outs and group sizes per key
  *    stay what they were — only the NUMBER of groups/users/orders
  *    grows, which is exactly how a real corpus grows;
  *  - dims (region, nation) are NOT replicated — a 10× corpus still has
  *    25 nations, so broadcast sides stay broadcast-sized;
  *  - calendar span is unchanged (ts/o_orderdate kept) — day-grain
  *    frames stay calendar-bounded while per-day density grows 10×;
  *  - document text is word-PERMUTED per copy (deterministic xxhash
  *    sort key): vocabulary, token counts, lengths, language and
  *    quality profiles are preserved (so gates fire at the same rates)
  *    while shingles differ across copies — without this, every copy is
  *    a near-duplicate of its original and the LSH/minhash bucket depth
  *    grows mult× (pair space mult²×), which would measure an artifact,
  *    not scaling;
  *  - embeddings get small deterministic per-copy noise and are
  *    re-normalized to unit — identical vectors across copies would
  *    make cosine ties and duplicate collapse the dominant effect.
  *
  * Usage: runMain graft.ScaleGen <baseSfDir> <outDir> <mult>
  */
object ScaleGen {
  private val Stride = 10000000000L // key shift per copy, > any base key

  def main(args: Array[String]): Unit = {
    val (base, out, mult) = (args(0), args(1), args(2).toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, base, out, mult)
    spark.stop()
  }

  def generate(s: SparkSession, base: String, out: String, mult: Int): Unit = {
    def shift(c: String, i: Int) = col(c) + lit(i.toLong * Stride)

    def copies(df: DataFrame)(derive: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until mult).map(i => derive(df, i)).reduce(_ unionAll _)

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      System.err.println(s"[scalegen] wrote $name")
    }

    // dims: copied verbatim (a bigger corpus has the same 25 nations)
    Seq("region", "nation").foreach { t =>
      write(s.read.parquet(s"$base/$t.parquet"), t)
    }

    write(copies(s.read.parquet(s"$base/customer.parquet")) { (df, i) =>
      df.withColumn("c_custkey", shift("c_custkey", i))
    }, "customer")

    write(copies(s.read.parquet(s"$base/supplier.parquet")) { (df, i) =>
      df.withColumn("s_suppkey", shift("s_suppkey", i))
    }, "supplier")

    write(copies(s.read.parquet(s"$base/part.parquet")) { (df, i) =>
      df.withColumn("p_partkey", shift("p_partkey", i))
    }, "part")

    write(copies(s.read.parquet(s"$base/orders.parquet")) { (df, i) =>
      df.withColumn("o_orderkey", shift("o_orderkey", i))
        .withColumn("o_custkey", shift("o_custkey", i))
    }, "orders")

    write(copies(s.read.parquet(s"$base/lineitem.parquet")) { (df, i) =>
      df.withColumn("l_orderkey", shift("l_orderkey", i))
        .withColumn("l_partkey", shift("l_partkey", i))
        .withColumn("l_suppkey", shift("l_suppkey", i))
    }, "lineitem")

    // events: keys shift, calendar/values stay — 10x users, same span
    write(copies(Tables.events(s, base)) { (df, i) =>
      df.withColumn("event_id", shift("event_id", i))
        .withColumn("user_id", shift("user_id", i))
    }, "events")

    // documents: per-copy deterministic word permutation (sort words by
    // xxhash64(word, copy)) — same bag of words, different shingles
    write(copies(s.read.parquet(s"$base/documents.parquet")) { (df, i) =>
      val permuted =
        if (i == 0) col("text")
        else concat_ws(" ",
          transform(
            array_sort(transform(split(col("text"), " "),
              w => struct(xxhash64(w, lit(i)).as("k"), w.as("w")))),
            p => p.getField("w")))
      df.withColumn("doc_id", shift("doc_id", i))
        .withColumn("text",
          when(col("text").isNull, lit(null: String)).otherwise(permuted))
    }, "documents")

    // embeddings: deterministic per-copy jitter, re-normalized to unit
    write(copies(s.read.parquet(s"$base/embeddings.parquet")) { (df, i) =>
      if (i == 0) df.withColumn("vec_id", shift("vec_id", i))
      else {
        val jittered = expr(
          s"""transform(embedding, (x, j) ->
             |  x + (pmod(xxhash64(vec_id, j, $i), 1000) / 1000.0 - 0.5)
             |      * 0.1)""".stripMargin)
        df.withColumn("vec_id", shift("vec_id", i))
          .withColumn("j", jittered)
          .withColumn("nrm", expr(
            "sqrt(aggregate(j, 0.0D, (a, x) -> a + x * x))"))
          .withColumn("embedding", expr(
            "transform(j, x -> cast(x / nrm AS FLOAT))"))
          .drop("j", "nrm")
      }
    }, "embeddings")
  }
}
