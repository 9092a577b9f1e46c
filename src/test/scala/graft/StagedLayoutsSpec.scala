package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

/** Contract of Scratch.stagedDir — the session-memoized staging tier the
  * read-semantics keys (DPP fact copy, footer layout, standing LSH and
  * minhash index halves) build on: the layout must build EXACTLY once
  * per (session, key), different keys must never share a directory, and
  * a new session must re-stage (the memo is an in-session investment,
  * not a cross-session cache — cross-session reuse is persistBucketed's
  * fingerprinted job).
  */
class StagedLayoutsSpec extends SparkSpecBase {

  test("stagedDir builds once per (session, key) and returns a stable dir") {
    val builds = new AtomicInteger(0)
    val key = s"spec:once:${System.nanoTime()}"
    def get(): String = Scratch.stagedDir(spark, key, "graft_spec_staged_") {
      d =>
        builds.incrementAndGet()
        Files.write(Paths.get(d, "marker"), "x".getBytes)
        ()
    }
    val d1 = get()
    val d2 = get()
    assert(d1 == d2, "same (session, key) must return the same directory")
    assert(builds.get() == 1, s"build ran ${builds.get()} times, expected 1")
    assert(Files.exists(Paths.get(d1, "marker")),
      "the staged layout must be the one the build wrote")
  }

  test("different keys stage into different directories") {
    val n = System.nanoTime()
    val d1 = Scratch.stagedDir(spark, s"spec:a:$n", "graft_spec_staged_")(_ => ())
    val d2 = Scratch.stagedDir(spark, s"spec:b:$n", "graft_spec_staged_")(_ => ())
    assert(d1 != d2, "distinct keys must never share a staged layout")
  }

  test("a different session re-stages (memo is per session object)") {
    val builds = new AtomicInteger(0)
    val key = s"spec:session:${System.nanoTime()}"
    def get(s: org.apache.spark.sql.SparkSession): String =
      Scratch.stagedDir(s, key, "graft_spec_staged_") { _ =>
        builds.incrementAndGet(); ()
      }
    val d1 = get(spark)
    // newSession shares the SparkContext but is a DIFFERENT session
    // object — the corpus-immutability argument is scoped to a session,
    // so the memo must not leak across
    val d2 = get(spark.newSession())
    assert(d1 != d2, "a new session must stage its own layout")
    assert(builds.get() == 2, s"build ran ${builds.get()} times, expected 2")
  }

  test("a failed build is not memoized — the next call retries") {
    val builds = new AtomicInteger(0)
    val key = s"spec:fail:${System.nanoTime()}"
    def get(fail: Boolean): String =
      Scratch.stagedDir(spark, key, "graft_spec_staged_") { _ =>
        builds.incrementAndGet()
        if (fail) sys.error("planted staging failure")
        ()
      }
    intercept[RuntimeException](get(fail = true))
    val d = get(fail = false)
    assert(d.nonEmpty)
    assert(builds.get() == 2,
      "the failed attempt must not poison the memo with a broken layout")
  }
}
