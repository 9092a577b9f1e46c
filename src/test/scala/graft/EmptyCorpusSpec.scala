package graft

import java.nio.file.Files

/** Degenerate-input robustness: every graded key must execute (not
  * necessarily return rows) against a corpus whose tables all have ZERO
  * rows. At 100 TB this is not a corner case — any per-partition filter,
  * per-day ingest shard, or per-language split can legitimately come up
  * empty, and an operator that crashes on it (a codebook sampled with
  * `take(k)` that got 0 rows, a connected-components probe that assumed
  * ≥1 edge, a head() on an empty aggregate) takes the whole job down.
  * Schemas are copied from the sf0.001 corpus via limit(0), so column
  * names/types are exactly the graded ones — only the row counts differ.
  */
class EmptyCorpusSpec extends SparkSpecBase {

  lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("graft-empty-corpus").toFile
    dir.deleteOnExit()
    // events.parquet carries TIMESTAMP(NANOS); read it the same way
    // Tables.events does (raw long) so the empty twin round-trips.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.names.foreach { t =>
      spark.read.parquet(s"$sfSmoke/$t.parquet")
        .limit(0)
        .coalesce(1)
        .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/$t.parquet")
    }
    dir.getAbsolutePath
  }

  test("every graded key executes against an all-empty corpus") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, emptyDir).count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
        }
    }
    assert(failures.isEmpty,
      s"\n${failures.size} keys crash on an empty corpus:\n  " +
        failures.mkString("\n  "))
  }

  /** A 50-row slice of each table plus ONE row whose every column is
    * NULL. Dirty data at 100 TB always includes null text / null keys /
    * null timestamps, and the fragile spots are exactly the custom
    * Catalyst expressions (null must short-circuit in BOTH codegen and
    * interpreted paths) and `size(split(...))`-style derivations (-1 on
    * null). The slice keeps real rows so joins/queries still traverse
    * their full plan shape. */
  lazy val nullsDir: String = {
    val dir = Files.createTempDirectory("graft-nulls-corpus").toFile
    dir.deleteOnExit()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.names.foreach { t =>
      val df = spark.read.parquet(s"$sfSmoke/$t.parquet")
      val allNull = df.limit(1).select(
        df.schema.fields.map(f =>
          org.apache.spark.sql.functions.lit(null).cast(f.dataType).as(f.name)): _*)
      df.limit(50).union(allNull)
        .coalesce(1)
        .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/$t.parquet")
    }
    dir.getAbsolutePath
  }

  test("every graded key executes against a corpus containing all-null rows") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, nullsDir).count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
        }
    }
    assert(failures.isEmpty,
      s"\n${failures.size} keys crash on a null-row corpus:\n  " +
        failures.mkString("\n  "))
  }

  /** A monoculture corpus: every document the SAME text, every embedding
    * the SAME vector. The worst-case duplicate skew — one LSH bucket
    * holds everything, the duplicate graph is one giant component, all
    * pairwise similarities tie at 1.0, k-means sees one distinct point.
    * Caps and tie-breaks must keep every operator bounded and running. */
  lazy val monoDir: String = {
    val dir = Files.createTempDirectory("graft-mono-corpus").toFile
    dir.deleteOnExit()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.names.foreach { t =>
      val df = spark.read.parquet(s"$sfSmoke/$t.parquet").limit(50)
      val skewed = t match {
        case "documents" =>
          df.withColumn("text",
            org.apache.spark.sql.functions.lit("same words every single time " * 5))
        case "embeddings" =>
          df.withColumn("embedding",
            org.apache.spark.sql.functions.expr(
              "transform(sequence(1, 64), i -> CAST(0.125 AS FLOAT))"))
        case _ => df
      }
      skewed.coalesce(1)
        .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/$t.parquet")
    }
    dir.getAbsolutePath
  }

  test("every graded key executes against a monoculture (all-identical) corpus") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, monoDir).count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
        }
    }
    assert(failures.isEmpty,
      s"\n${failures.size} keys crash on a monoculture corpus:\n  " +
        failures.mkString("\n  "))
  }

  test("flagship entry executes against an all-empty corpus") {
    // entry() reads sf0.001 by contract; the empty-corpus variant of the
    // same plan is agg_groupby, covered above — here just pin that the
    // canonical flagship still runs on the real smoke corpus (driver
    // smoke-check twin).
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
