package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Records

/** The [[Dedup.spanDuplicates]] sampling lever, measured: the census
  * exchange is token-count-sized at sampleMod=1 and shrinks m× with
  * the deterministic 1/m coverage sample — [[Dedup.adaptiveSampleMod]]
  * holds it ~constant as the corpus grows. This main runs the census
  * at one sf for a list of moduli and prints one JSON line per modulus:
  * `{"metric":"span_scale","docs":n,"mod":m,"census_sec":…,
  *   "repeated_spans":…}`.
  *
  * Usage: SpanScaleBench <sfDir> [mod ...]  (default mods: 4 16)
  */
object SpanScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mods = if (args.length > 1) args.drop(1).map(_.toLong).toSeq
      else Seq(4L, 16L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local("graft-span-scale", cpus)
    spark.sparkContext.setLogLevel("WARN")

    val raw = Records.table(spark, sfDir, "documents")
    val par = spark.sparkContext.defaultParallelism
    val docs = if (raw.rdd.getNumPartitions < par) raw.repartition(par) else raw
    val n = docs.count()

    mods.foreach { m =>
      val t0 = System.nanoTime()
      val repeated = Dedup.spanDuplicates(docs, spanTokens = 8, sampleMod = m)
        .count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"metric":"span_scale","docs":$n,"mod":$m,""" +
        f""""census_sec":$sec%.2f,"repeated_spans":$repeated,"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
