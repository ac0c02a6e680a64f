package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Random-hyperplane LSH for embedding vectors (SimHash-for-vectors).
 *
 * Buckets cosine-similar vectors: vectors on the same side of every
 * hyperplane in a table share that table's bucket. With `bitsPerTable`
 * planes a bucket holds ~n/2^bits of a label's vectors — a FIXED expected
 * fraction — so in-bucket all-pairs work is bounded regardless of how
 * skewed a label is (the failure mode of label-only blocking at 100 TB).
 * Multiple tables trade candidate growth for recall: a pair colliding in
 * ANY table becomes a candidate (P(collide/table) = (1 − θ/π)^bits).
 *
 * Hyperplane components are md5-seeded rationals k/1000 with
 * k ∈ [−1000, 1000], computed identically on the JVM and as SQL
 * literals — both engines parse the same decimal to the same double, so
 * bucket ids are bit-identical for the DuckDB oracle.
 */
object VectorLsh {

  /** `('0x' || substr(md5(s), 1, 15))::BIGINT` on the JVM. */
  private[graft] def md5Long15(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.map(b => f"$b%02x").mkString.substring(0, 15), 16)
  }

  /** Integer numerators of plane `p`'s components (denominator 1000). */
  def planeK(plane: Int, dims: Int): IndexedSeq[Long] =
    (0 until dims).map(i => (md5Long15(s"h:$plane:$i") % 2001L) - 1000L)

  /** Bits per table sized to the corpus so expected bucket occupancy
    * stays ~`targetPerBucket` regardless of n — the knob that keeps
    * in-bucket all-pairs work LINEAR in corpus size (fixed bits make it
    * quadratic: measured ×100 candidates for ×10 rows at 3 bits).
    * Monotone in n; 3 bits up to n = 2000 (the oracle-gate scales, so
    * the fixed-bit oracle SQL stays bit-identical there). More bits
    * lower recall for BORDERLINE pairs (P(collide/table) = (1−θ/π)^bits)
    * — compensate with more tables when the threshold is loose. */
  def adaptiveBits(n: Long, targetPerBucket: Long = 250L): Int =
    math.max(3, math.ceil(
      math.log(math.max(1.0, n.toDouble / targetPerBucket)) / math.log(2.0)).toInt)

  /** Spark-SQL dot product of array column `vCol` with plane `p` via
    * the codegen'd `vec_dot` kernel (sequential index-order fold —
    * deterministic, matches DuckDB list_dot_product; the literal plane
    * array constant-folds into a single ArrayData). */
  private def dotExpr(vCol: String, plane: Int, dims: Int): String = {
    val lits = planeK(plane, dims)
      .map(k => s"cast($k as double)/1000.0").mkString("array(", ",", ")")
    s"vec_dot($vCol, $lits)"
  }

  /** DuckDB literal list for plane `p`. */
  private def dotSql(vCol: String, plane: Int, dims: Int): String = {
    val lits = planeK(plane, dims)
      .map(k => s"CAST($k AS DOUBLE)/1000.0").mkString("[", ",", "]")
    s"list_dot_product($vCol, $lits)"
  }

  /** Spark expression for table `t`'s bucket id of `vCol`. */
  def bucketExpr(vCol: String, table: Int, bitsPerTable: Int, dims: Int): String =
    (0 until bitsPerTable).map { j =>
      s"(case when ${dotExpr(vCol, table * bitsPerTable + j, dims)} >= 0" +
        s" then ${1 << j} else 0 end)"
    }.mkString("(", " + ", ")")

  /** DuckDB expression for the same bucket id. */
  def bucketSql(vCol: String, table: Int, bitsPerTable: Int, dims: Int): String =
    (0 until bitsPerTable).map { j =>
      s"(CASE WHEN ${dotSql(vCol, table * bitsPerTable + j, dims)} >= 0" +
        s" THEN ${1 << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /**
   * Candidate pairs within (`blockCols`, table, bucket): input needs
   * (idCol, blockCols..., v: array&lt;double&gt;); output one row per
   * distinct candidate pair (id_a, id_b, blockCols...).
   */
  def candidatePairs(
      e: DataFrame,
      idCol: String,
      blockCols: Seq[String],
      tables: Int = 2,
      bitsPerTable: Int = 3,
      dims: Int = 64): DataFrame = {
    val buckets = (0 until tables).map(t =>
      struct(lit(t).as("tbl"),
        expr(bucketExpr("v", t, bitsPerTable, dims)).as("bucket")))
    val tagged = e.withColumn("tb", explode(array(buckets: _*)))
      .select((Seq(col(idCol), col("tb.tbl").as("tbl"),
        col("tb.bucket").as("bucket")) ++ blockCols.map(col)): _*)
    val keys = Seq("tbl", "bucket") ++ blockCols
    val a = tagged.withColumnRenamed(idCol, "id_a")
    val b = tagged.withColumnRenamed(idCol, "id_b")
    a.join(b, keys).filter(col("id_a") < col("id_b"))
      .select((Seq(col("id_a"), col("id_b")) ++ blockCols.map(col)): _*)
      .distinct()
  }
}
