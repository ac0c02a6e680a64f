package graft.operators

import graft.SparkTestSession
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property: the aggregate-bounded selection equals the naive
  * global-running-sum formulation on random corpora — heavy rank TIES
  * (small rank domain) so the boundary-value branch and its keyed
  * running window are exercised constantly, budgets from zero through
  * everything, and exact-boundary budgets. */
object SelectionProps extends Properties("Selection") {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val corpusGen = for {
    n <- Gen.choose(0, 60)
    rows <- Gen.listOfN(n, Gen.zip(
      Gen.choose(0L, 20L),   // n_tok (0 allowed)
      Gen.choose(0L, 4L)))   // rank: tiny domain → constant ties
  } yield rows.zipWithIndex.map { case ((t, q), i) => (i.toLong, t, q) }

  private def truth(rows: Seq[(Long, Long, Long)], b: Long) = {
    var cum = 0L
    rows.sortBy { case (id, _, q) => (-q, id) }
      .flatMap { case (id, t, q) =>
        cum += t
        if (cum <= b) Some((id, q, t)) else None
      }
  }

  property("selectByTokenBudget == global running sum, any budget") =
    forAll(corpusGen, Gen.choose(0L, 400L)) { (rows, b) =>
      val m = rows.toDF("doc_id", "n_tok", "quality_micro")
      val budget = Seq(b).toDF("b")
      val got = Selection.selectByTokenBudget(m, budget)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      got == truth(rows, b)
    }

  property("exact-boundary budgets keep exactly the prefix") =
    forAll(corpusGen, Gen.choose(0, 60)) { (rows, k0) =>
      // budget equal to the running sum after k docs: the kept set is
      // exactly those k docs (inclusive <= semantics)
      val ordered = rows.sortBy { case (id, _, q) => (-q, id) }
      val k = math.min(k0, ordered.length)
      val b = ordered.take(k).map(_._2).sum
      val m = rows.toDF("doc_id", "n_tok", "quality_micro")
      val got = Selection.selectByTokenBudget(m, Seq(b).toDF("b"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      got == truth(rows, b)
    }
}
