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
  * Usage: SpanScaleBench <sfDir> [mod ...]  (default mods: 4 16).
  * `mod = 0` exercises the AUTO modulus ([[Dedup.adaptiveSampleMod]]
  * from the corpus's exact window count — the production default).
  * With env `GRAFT_SPAN_DEDUP` set the main also times the d17 ACTION
  * pass and prints one `span_dedup` line per requested mode with the
  * census/rewrite split and the fraction of corpus tokens cut —
  * `literal`, `bloom` (forced big-census fallback, same-session A/B
  * against literal) and `sampled` (census-with-first at the auto
  * corpus-scaled modulus); `1` means `literal`.
  */
object SpanScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mods = if (args.length > 1) args.drop(1).map(_.toLong).toSeq
      else Seq(4L, 16L)
    // GRAFT_SPAN_DEDUP: "1" (legacy — literal mode only) or a comma
    // list of modes: literal | bloom (maxLiteralFlagged = 0 — the
    // 100-TB path A/B'd against literal in the same session) |
    // sampled (census-with-first at the auto corpus-scaled modulus —
    // the d17c lever). Parsed and VALIDATED before any Spark work: an
    // unrecognized mode must fail fast, not after minutes of census
    // measurements (and a silent fall-through would measure the
    // literal path under the requested label — corrupt bench records)
    val dedupModes = sys.env.get("GRAFT_SPAN_DEDUP") match {
      case Some("1") => Seq("literal")
      case Some(ms) => ms.split(',').map(_.trim).filter(_.nonEmpty).toSeq
      case None => Seq.empty
    }
    val knownModes = Set("literal", "bloom", "sampled")
    require(dedupModes.forall(knownModes),
      s"unknown GRAFT_SPAN_DEDUP mode in $dedupModes — use " +
        s"${knownModes.mkString("|")} (or 1 = literal)")
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

    if (sys.env.get("GRAFT_SPAN_STREAM").contains("1")) {
      // d18 sliced-arrival point: split the fixture into 8 doc_id-range
      // slices (cached per sfDir) and run the durable incremental
      // census one slice per micro-batch, compacting every 4 batches.
      // The cache validates against the fixture's mtime and is built
      // in a staging dir renamed into place ATOMICALLY — a
      // regenerated fixture (the documented per-round workflow) or a
      // crash mid-slice-write must never silently bench stale or
      // partial slices (the round-17 advice)
      val fixtureMtime = {
        val doc = new java.io.File(sfDir, "documents.parquet")
        val f = if (doc.exists()) doc else new java.io.File(sfDir)
        f.lastModified().toString
      }
      val sliceDir = new java.io.File(
        s"/tmp/graft_span_slices_${new java.io.File(sfDir).getName}")
      val marker = new java.io.File(sliceDir, "_complete")
      val cacheValid = marker.exists() && {
        val recorded = new String(java.nio.file.Files.readAllBytes(
          marker.toPath), java.nio.charset.StandardCharsets.UTF_8)
        recorded == fixtureMtime
      }
      if (!cacheValid) {
        val staging = new java.io.File(sliceDir.getParent,
          sliceDir.getName + ".staging")
        org.apache.commons.io.FileUtils.deleteDirectory(staging)
        staging.mkdirs()
        val all = Records.table(spark, sfDir, "documents")
        val mm = all.agg(min("doc_id"), max("doc_id")).collect()(0)
        val (lo, hi) = (mm.getLong(0), mm.getLong(1))
        val width = (hi - lo) / 8 + 1
        for (i <- 0 until 8) {
          val tmp = s"$staging/_tmp_$i"
          all.filter(col("doc_id") >= lo + i * width &&
              col("doc_id") < lo + (i + 1) * width)
            .coalesce(1).write.mode("overwrite").parquet(tmp)
          val ls = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
          val part =
            try ls.filter(_.toString.endsWith(".parquet")).findFirst().get()
            finally ls.close()
          java.nio.file.Files.move(part, java.nio.file.Paths.get(
            f"$staging/documents-$i%02d.parquet"))
          org.apache.commons.io.FileUtils.deleteDirectory(
            new java.io.File(tmp))
        }
        // the marker lands INSIDE staging before the publish rename,
        // so a crash at any point leaves either the old valid cache or
        // an unmarked dir that the next run rebuilds
        java.nio.file.Files.write(
          new java.io.File(staging, "_complete").toPath,
          fixtureMtime.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        org.apache.commons.io.FileUtils.deleteDirectory(sliceDir)
        if (!staging.renameTo(sliceDir))
          sys.error(s"could not publish slice cache to $sliceDir")
      }
      val workDir = SessionTemp.dir("span_stream_")
      val t0 = System.nanoTime()
      graft.streaming.IncrementalSpanCensus.run(spark,
        sliceDir.toString, workDir, compactEvery = 4)
      val runSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val censusRows = graft.streaming.IncrementalSpanCensus
        .census(spark, workDir).count()
      val readSec = (System.nanoTime() - t1) / 1e9
      println(f"""{"metric":"span_stream","docs":$n,"batches":8,""" +
        f""""run_sec":$runSec%.2f,"census_read_sec":$readSec%.2f,""" +
        f""""repeated_spans":$censusRows,"sf":"$sfDir"}""")
    }

    // one span_dedup JSON line per validated mode (parsed at startup)
    dedupModes.foreach { mode =>
      val t0 = System.nanoTime()
      val census =
        if (mode == "sampled")
          Dedup.spanCensusWithFirst(docs, spanTokens = 8, sampleMod = 0L)
        else Dedup.spanCensusWithFirst(docs, spanTokens = 8)
      val censusTmp = SessionTemp.dir("span_dedup_census_")
      census.write.mode("overwrite").parquet(censusTmp)
      val flagged = spark.read.parquet(censusTmp).count()
      val censusSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val maxLit = if (mode == "bloom") 0L else Dedup.defaultMaxLiteralFlagged
      val agg = Dedup.spanDedupCorpus(docs,
          spark.read.parquet(censusTmp), spanTokens = 8,
          maxLiteralFlagged = maxLit)
        .agg(sum("n_tokens"), sum("n_kept")).collect()(0)
      val (tot, kept) = (agg.getLong(0), agg.getLong(1))
      val rewriteSec = (System.nanoTime() - t1) / 1e9
      println(f"""{"metric":"span_dedup","mode":"$mode","docs":$n,""" +
        f""""flagged_spans":$flagged,"census_sec":$censusSec%.2f,""" +
        f""""rewrite_sec":$rewriteSec%.2f,""" +
        f""""cut_frac":${(tot - kept).toDouble / math.max(tot, 1)}%.4f,""" +
        f""""sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
