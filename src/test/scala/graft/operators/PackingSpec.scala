package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parameter generality of the packing/ordering surface beyond the
  * catalog defaults the oracles pin (p6 budget 256, p11 400/300,
  * p12 16 shards): arbitrary budgets/widths/strides/shard counts,
  * conservation invariants, and the determinism contracts. */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docsOf(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  test("packSequences conserves tokens and numbers sequences contiguously") {
    val d = docsOf(
      (1L, "a", "x " * 10), (2L, "a", "x " * 25), (3L, "a", "x " * 5),
      (4L, "b", "x " * 100))
      .select(col("source"), col("doc_id"),
        size(expr(TextAnalysis.tokensExpr)).cast("long").as("n_tokens"))
    for (budget <- Seq(7L, 16L, 1000L)) {
      val out = Packing.packSequences(d, budget).collect()
      val bySrc = out.groupBy(_.getString(0))
      // token totals survive packing at any budget
      assert(bySrc("a").map(_.getLong(3)).sum == 40L, s"budget=$budget")
      assert(bySrc("b").map(_.getLong(3)).sum == 100L)
      // seq ids start at 0, no gaps beyond what budget skipping allows
      assert(bySrc("a").map(_.getLong(1)).min == 0L)
      // a budget larger than the group packs into exactly one sequence
      if (budget == 1000L) assert(out.length == 2)
    }
  }

  test("packSequencesSharded equals packSequences for any shard span") {
    val rnd = new scala.util.Random(42L)
    // one giant group (g0: 300 docs), two small ones; sparse ids with
    // gaps so the coarse ranges are uneven on purpose
    val rows = (0 until 360).map { i =>
      val id = i.toLong * 7 + (if (i % 3 == 0) 2 else 0)
      val src = if (i < 300) "g0" else if (i < 330) "g1" else "g2"
      (id, src, "x " * (1 + rnd.nextInt(40)))
    }
    val d = docsOf(rows: _*)
      .select(col("source"), col("doc_id"),
        size(expr(TextAnalysis.tokensExpr)).cast("long").as("n_tokens"))
    for (budget <- Seq(17L, 256L); span <- Seq(1L, 100L, 1000000L)) {
      val flat = Packing.packSequences(d, budget).collect().toSeq
      val sharded = Packing.packSequencesSharded(d, budget, span)
        .collect().toSeq
      assert(sharded == flat, s"budget=$budget span=$span")
      // layout invariance of the sharded form too
      val reparted = Packing.packSequencesSharded(
        d.repartition(13), budget, span).collect().toSeq
      assert(reparted == flat, s"repartitioned, budget=$budget span=$span")
    }
    intercept[IllegalArgumentException] {
      Packing.packSequencesSharded(d, 0L, 10L)
    }
    intercept[IllegalArgumentException] {
      Packing.packSequencesSharded(d, 10L, 0L)
    }
  }

  test("chunkOverlapping covers every char and respects width/stride") {
    val text = (1 to 950).map(_ => "a").mkString
    val d = docsOf((1L, "s", text), (2L, "s", ""), (3L, "s", "tiny"))
    val out = Packing.chunkOverlapping(d, width = 200, stride = 150)
      .collect().groupBy(_.getLong(0))
    // doc 1: ceil((950-1)/150)+1 = 7 chunks; last chunk shorter
    assert(out(1L).length == 7)
    assert(out(1L).map(_.getLong(2)).max == 200L)
    // empty and short docs yield exactly one chunk each
    assert(out(2L).length == 1 && out(2L).head.getLong(2) == 0L)
    assert(out(3L).length == 1 && out(3L).head.getLong(2) == 4L)
    // stride > width refuses (characters would fall in no chunk)
    intercept[IllegalArgumentException] {
      Packing.chunkOverlapping(d, width = 100, stride = 150)
    }
  }

  test("trainingOrder is deterministic under repartitioning and salts apart") {
    val d = docsOf((1L to 200L).map(i => (i, "s", "t")): _*)
    val a = Packing.trainingOrder(d, nShards = 8).collect().toSeq
    val b = Packing.trainingOrder(d.repartition(13), nShards = 8).collect().toSeq
    assert(a == b, "order independent of physical layout")
    // every shard's positions are 1..k contiguous
    a.groupBy(_.getLong(1)).foreach { case (shard, rows) =>
      assert(rows.map(_.getLong(2)).sorted == (1L to rows.length).toSeq,
        s"shard $shard")
    }
    // a different salt produces a different permutation
    val c = Packing.trainingOrder(d, nShards = 8, salt = "other").collect().toSeq
    assert(a != c)
    // shard count is respected
    assert(Packing.trainingOrder(d, nShards = 3).select("shard").distinct()
      .collect().map(_.getLong(0)).toSet.subsetOf(Set(0L, 1L, 2L)))
  }
}
