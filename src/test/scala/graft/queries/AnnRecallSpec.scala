package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** IVF ANN quality: recall of sim_topk_ivf against the exact brute-force
  * baseline on the same fixture queries. nprobe=2 of 8 cells searches a
  * quarter of the corpus; recall must stay well above that fraction for
  * the index to be doing its job. */
class AnnRecallSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("IVF recall@3 vs exact top-3 on the shared query ids") {
    val dir = SparkTestSession.sfDir
    val ivf = Catalog.byName("sim_topk_ivf").fn(spark, dir)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    // exact top-3 for the same queries from the brute-force baseline
    val exact = Catalog.byName("sim_topk_bruteforce").fn(spark, dir)
      .filter("q_id < 20 and rank <= 3")
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val qids = exact.map(_._1)
    assert(qids.nonEmpty)
    val hit = exact.count(ivf.contains)
    val recall = hit.toDouble / exact.size
    info(f"IVF recall@3 = $recall%.3f ($hit/${exact.size})")
    // far better than the 25% a random quarter-corpus scan would give
    assert(recall >= 0.5)
  }
}
