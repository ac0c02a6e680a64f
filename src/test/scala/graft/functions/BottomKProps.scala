package graft.functions

import graft.SparkTestSession
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property: `bottom_k_distinct(v, k)` equals take-k of the sorted
  * distinct values for random k, random values (negatives, duplicates),
  * and random grouping — across the partial/merge path (inputs are
  * repartitioned so every case exercises serialize + merge). */
object BottomKProps extends Properties("BottomKDistinct") {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val values = Gen.listOfN(60,
    Gen.zip(Gen.choose(0, 3), Gen.choose(-500L, 500L)))
  private val kGen = Gen.choose(1, 20)

  propertyWithSeed("equals sorted-distinct take-k", None) =
    forAll(values, kGen) { (vs, k) =>
      val df = vs.toDF("g", "v").repartition(7)
      val got = df.groupBy("g")
        .agg(org.apache.spark.sql.functions.expr(s"bottom_k_distinct(v, $k)")
          .as("ks"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toList).toMap
      val expected = vs.groupBy(_._1).view
        .mapValues(_.map(_._2).distinct.sorted.take(k).toList).toMap
      got == expected
    }
}
