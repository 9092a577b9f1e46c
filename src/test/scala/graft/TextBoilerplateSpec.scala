package graft

import java.nio.file.Files
import org.apache.spark.sql.Row

/** Semantic checks for cross-document boilerplate pruning on a PLANTED
  * corpus — the oracle proves cross-engine agreement on the real corpus;
  * this proves the df rule means what the C4-style gate says: a span
  * shared by ≥ 5 documents is boilerplate everywhere it appears, a doc
  * that is nothing but the shared span is flagged, and unique content
  * never is.
  */
class TextBoilerplateSpec extends SparkSpecBase {

  private lazy val corpusDir: String = {
    val dir = Files.createTempDirectory("graft-bp-corpus").toFile
    dir.deleteOnExit()
    import spark.implicits._
    // docs 0..5 embed the shared span "foo bar baz" (df = 7 with doc 6)
    // inside otherwise-unique text; doc 6 IS the span; doc 7 is clean.
    val docs = ((0 to 5).map(i => (i.toLong, s"u${i}a u${i}b foo bar baz u${i}c")) :+
        (6L, "foo bar baz") :+ (7L, "q r s t u v"))
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'test' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
    docs.coalesce(1).write.mode("overwrite")
      .parquet(s"${dir.getAbsolutePath}/documents.parquet")
    dir.getAbsolutePath
  }

  private lazy val byDoc: Map[Long, Row] =
    graft.operators.TextOps.textBoilerplateNgrams(spark, corpusDir)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("a shared span counts as boilerplate in every carrier, scaled by doc size") {
    val r = byDoc(0L)
    assert(r.getAs[Long]("n_grams") == 4L)   // 6 words → 4 distinct 3-grams
    assert(r.getAs[Long]("n_boiler") == 1L)  // only "foo bar baz" crosses df ≥ 5
    assert(r.getAs[Double]("boiler_frac") == 0.25)
    assert(r.getAs[Long]("bp_flag") == 0L)   // a quarter boilerplate is kept
  }

  test("a document that is nothing but the shared span is flagged") {
    val r = byDoc(6L)
    assert(r.getAs[Long]("n_grams") == 1L && r.getAs[Long]("n_boiler") == 1L)
    assert(r.getAs[Double]("boiler_frac") == 1.0)
    assert(r.getAs[Long]("bp_flag") == 1L)
  }

  test("unique content has zero boilerplate") {
    val r = byDoc(7L)
    assert(r.getAs[Long]("n_boiler") == 0L)
    assert(r.getAs[Double]("boiler_frac") == 0.0)
    assert(r.getAs[Long]("bp_flag") == 0L)
  }
}
