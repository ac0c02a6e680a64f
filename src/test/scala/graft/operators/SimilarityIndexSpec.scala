package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The persisted IVF index against its one-shot reference: probe ≡
  * ivfTopK row-for-row (one arithmetic, two access paths — the
  * Retrieval probe ≡ scan discipline), marker-gated reuse/rebuild,
  * and the loud-failure paths. */
class SimilarityIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Deterministic pseudo-random embeddings: 8-dim, values in
    * [-1, 1), plus one all-zeros vector (must be excluded everywhere
    * like the one-shot path excludes it). */
  private def embeddings(n: Int) = {
    val rows = (0 until n).map { i =>
      val v =
        if (i == 7) Array.fill(8)(0.0)
        else Array.tabulate(8)(d => ((i * 31 + d * 17) % 19 - 9) / 9.5)
      (i.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "v")
  }

  test("probeIvfIndex ≡ ivfTopK row-for-row (incl. the zero-norm exclusion)") {
    val e = embeddings(40)
    val idx = java.nio.file.Files
      .createTempDirectory("graft_ivfidx_").toString
    Similarity.buildIvfIndex(e, idx, "fp0", nCells = 4)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val probed = Similarity.probeIvfIndex(spark, idx, q, k = 3, nprobe = 2)
      .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
    val oneShot = Similarity.ivfTopK(e, col("vec_id") < 10, k = 3,
        nCells = 4, nprobe = 2)
      .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
    assert(probed === oneShot, "persisted probe drifted from the one-shot path")
    // the zero-norm vector (id 7) appears as neither query nor result
    assert(!probed.exists(r => r.head == 7L || r(1) == 7L))
  }

  test("ensureIvfIndex: matching marker reuses, stale fingerprint or geometry rebuilds, no marker rebuilds") {
    val e = embeddings(20)
    val idx = java.nio.file.Files
      .createTempDirectory("graft_ivfidx_ens_").toString
    assert(Similarity.ensureIvfIndex(e, idx, "fpA", nCells = 4),
      "first call must build")
    assert(!Similarity.ensureIvfIndex(e, idx, "fpA", nCells = 4),
      "same fingerprint+geometry must reuse")
    assert(Similarity.ensureIvfIndex(e, idx, "fpB", nCells = 4),
      "changed corpus fingerprint must rebuild")
    assert(Similarity.ensureIvfIndex(e, idx, "fpB", nCells = 5),
      "changed geometry must rebuild")
    // half-written index: data present, marker gone → rebuild
    java.nio.file.Files.delete(java.nio.file.Paths.get(idx, "_built"))
    assert(Similarity.ensureIvfIndex(e, idx, "fpB", nCells = 5),
      "missing marker (crash mid-build) must rebuild")
  }

  test("a rebuild that FAILS mid-build uncommits: the old marker cannot preside over mixed index data") {
    val e = embeddings(20)
    val idx = java.nio.file.Files
      .createTempDirectory("graft_ivfidx_crash_").toString
    Similarity.buildIvfIndex(e, idx, "fpA", nCells = 4)
    assert(Similarity.readIvfMeta(idx).isDefined)
    // a corpus whose evaluation throws at runtime (ANSI divide by
    // zero) — the rebuild starts, removes the commit marker, then dies
    import org.apache.spark.sql.functions.expr
    val poisoned = e.withColumn("v",
      expr("array(cast(vec_id as double) / 0.0)"))
    intercept[Exception] {
      Similarity.buildIvfIndex(poisoned, idx, "fpB", nCells = 4)
    }
    assert(Similarity.readIvfMeta(idx).isEmpty,
      "failed rebuild left the PREVIOUS build's marker — probes would " +
        "silently serve mixed index data")
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    intercept[IllegalArgumentException] {
      Similarity.probeIvfIndex(spark, idx, q, k = 3)
    }
    // ensure sees the uncommitted index and rebuilds cleanly
    assert(Similarity.ensureIvfIndex(e, idx, "fpB", nCells = 4))
    assert(Similarity.probeIvfIndex(spark, idx, q, k = 3, nprobe = 2)
      .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq ===
      Similarity.ivfTopK(e, col("vec_id") < 5, k = 3, nCells = 4,
        nprobe = 2).orderBy("q_id", "rank").collect().map(_.toSeq).toSeq)
  }

  test("probeIvfIndex without a committed index fails loudly") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft_ivfidx_none_").toString
    val q = Seq((1L, Seq(1.0, 0.0))).toDF("q_id", "qv")
    val ex = intercept[IllegalArgumentException] {
      Similarity.probeIvfIndex(spark, idx, q, k = 1)
    }
    assert(ex.getMessage.contains("no committed IVF index"))
  }
}
