package graft.operators

import graft.SparkTestSession
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property: [[Quantiles.exactGrouped]] (histogram narrowing) equals
  * Spark's own exact `percentile` aggregate on random grouped doubles —
  * including single-row groups, heavy duplicates (many rows per unit
  * bucket), negative values, sub-unit value ranges (everything in one
  * bucket), and integral interpolation ranks. The two compute the same
  * continuous-interpolation definition, so equality is exact up to one
  * ulp-level tolerance. */
object QuantilesProps extends Properties("Quantiles") {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  // values concentrated so unit buckets hold several rows; a 0.1 scale
  // factor variant squeezes whole groups into a single bucket
  private val rowsGen = for {
    n <- Gen.choose(1, 300)
    scale <- Gen.oneOf(0.1, 1.0, 25.0)
    rows <- Gen.listOfN(n,
      Gen.zip(Gen.choose(0, 3), Gen.choose(-40, 40), Gen.choose(0, 9)))
  } yield rows.map { case (g, v, frac) => (g, v * scale + frac * 0.01) }

  private val qs = Seq(0.0, 0.25, 0.5, 0.9, 1.0)

  property("equals Spark percentile on random grouped doubles") =
    forAll(rowsGen) { rows =>
      val df = rows.toDF("g", "v")
      val got = Quantiles.exactGrouped(df, "g", "v", qs)
        .collect()
        .map(r => r.getInt(0) ->
          (r.getLong(1), qs.indices.map(i => r.getDouble(2 + i))))
        .toMap
      val want = df.groupBy("g")
        .agg(count(lit(1)).as("n"),
          expr(s"percentile(v, array(${qs.mkString(", ")}))").as("ps"))
        .collect()
        .map(r => r.getInt(0) ->
          (r.getLong(1), r.getSeq[Double](2).toIndexedSeq))
        .toMap
      got.keySet == want.keySet && got.forall { case (g, (n, ps)) =>
        val (wn, wps) = want(g)
        n == wn && ps.zip(wps).forall { case (a, b) =>
          math.abs(a - b) <= math.max(1e-9, math.abs(b) * 1e-12)
        }
      }
    }
}
