package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hyperplane LSH bucketing: bounded candidate growth on a maximally
  * skewed block (every vector in ONE label), exact-duplicate recall, and
  * determinism of the seeded planes. */
class VectorLshSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val dims = 64

  /** Deterministic pseudo-random vector for id `i` (md5-mixed so
    * components are uncorrelated across ids, unlike trig patterns). */
  private def vec(i: Int): Seq[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until dims).map { d =>
      val h = md.digest(s"v:$i:$d".getBytes("UTF-8"))
        .take(4).foldLeft(0L)((a, b) => (a << 8) | (b & 0xff))
      (h % 2001 - 1000) / 1000.0
    }
  }

  test("skewed label: candidates stay a bounded fraction of all-pairs") {
    val n = 300
    val rows = (0 until n).map(i => (i.toLong, 0, vec(i)))
    val e = rows.toDF("vec_id", "label", "v")
    val cand = VectorLsh.candidatePairs(e, "vec_id", Seq("label"))
    val pairs = cand.count()
    val allPairs = n.toLong * (n - 1) / 2
    // 2 tables × 3 bits ⇒ expected ≈ 2/8 − 1/64 ≈ 23% for random vectors;
    // label-only blocking would be 100%
    assert(pairs < allPairs * 0.35,
      s"$pairs of $allPairs pairs — bucketing did not bound the block")
    assert(pairs > 0)
  }

  test("exact duplicates always collide (identical buckets in all tables)") {
    val base = (0 until 50).map(i => (i.toLong, 0, vec(i)))
    val dups = (0 until 10).map(i => (100L + i, 0, vec(i))) // copies of 0..9
    val e = (base ++ dups).toDF("vec_id", "label", "v")
    val cand = VectorLsh.candidatePairs(e, "vec_id", Seq("label"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    (0 until 10).foreach { i =>
      assert(cand.contains((i.toLong, 100L + i)), s"dup pair $i missing")
    }
  }

  test("planes are deterministic and non-degenerate") {
    val p0 = VectorLsh.planeK(0, dims)
    assert(p0 == VectorLsh.planeK(0, dims))
    assert(p0 != VectorLsh.planeK(1, dims))
    assert(p0.exists(_ > 0) && p0.exists(_ < 0))
    assert(p0.forall(k => k >= -1000 && k <= 1000))
  }

  test("different labels never pair, even in the same bucket") {
    val e = (0 until 20).map(i => (i.toLong, i % 2, vec(i / 2)))
      .toDF("vec_id", "label", "v")
    val cand = VectorLsh.candidatePairs(e, "vec_id", Seq("label"))
    val crossLabel = cand.join(
      e.select(col("vec_id").as("id_a"), col("label").as("la")), "id_a")
      .join(e.select(col("vec_id").as("id_b"), col("label").as("lb")), "id_b")
      .filter(col("la") =!= col("lb")).count()
    assert(crossLabel == 0)
  }
}
