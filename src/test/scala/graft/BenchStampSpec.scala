package graft

import org.scalatest.funsuite.AnyFunSuite

/** The A/B stamp's doc-only-successor rule: committing the stamp (and
  * the survey prose citing it) necessarily advances HEAD past the
  * measured shipped_sha, so the embed guard accepts an ancestor stamp
  * IFF nothing that executes changed since. This pins the path
  * predicate that decides "executes" — a hole here would let a source
  * change ride under a stale control. */
class BenchStampSpec extends AnyFunSuite {

  test("executable paths invalidate a stamp") {
    for (f <- Seq(
        "src/main/scala/graft/Bench.scala",
        "src/main/scala/graft/operators/Dedup.scala",
        "src/test/scala/graft/BenchStampSpec.scala", // tests ship in src/
        "tools/bench.sh",
        "tools/check.py",
        "project/build.properties",
        "build.sbt"))
      assert(Bench.abExecutablePath(f), s"$f must invalidate the stamp")
  }

  test("artifacts and prose never invalidate a stamp") {
    for (f <- Seq(
        "BENCH_AB.json",
        "BENCH_sf1.json",
        "SURVEY.md",
        "README.md",
        "VERDICT.md",
        "CORRECTNESS_r19.json",
        "PROGRESS.jsonl"))
      assert(!Bench.abExecutablePath(f), s"$f must not invalidate the stamp")
  }
}
