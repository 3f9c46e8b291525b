package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed sketches — the approximate counterparts of the exact
  * distinct aggregates (q14), for the cardinalities where exactness
  * stops scaling.
  *
  * KMV (k-minimum-values): keep the k smallest hash values seen; the
  * distinct-count estimate is (k−1) / x_(k) where x_(k) is the k-th
  * minimum mapped to (0,1). The buffer is a bounded sorted array →
  * merge is a k-way bounded merge, shuffle traffic is O(k) per group
  * regardless of input size, and the same sketch supports set
  * operations (Jaccard of two KMVs) — the property MinHash dedup
  * builds on. Implemented as a typed [[Aggregator]] (ObjectHashAggregate
  * at runtime): partial sketches combine map-side, exactly like any
  * built-in partial aggregate.
  *
  * Spark's own `approx_count_distinct` (HLL) is surfaced alongside it
  * for comparison; both are rows-only for the driver (estimators have
  * no DuckDB-equal output) with accuracy pinned in SketchesSpec.
  */
object Sketches {

  /** KMV sketch over pre-hashed longs (feed `xxhash64(col)`). */
  final case class Kmv(k: Int) extends Aggregator[Long, Array[Long], Double] {

    override def zero: Array[Long] = Array.empty

    /** Insert, keeping the k smallest distinct hashes (sorted asc). */
    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      val idx = java.util.Arrays.binarySearch(buf, h)
      if (idx >= 0) buf // already present
      else {
        val ins = -idx - 1
        if (buf.length < k) {
          val out = new Array[Long](buf.length + 1)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
          out
        } else if (ins < k) {
          val out = new Array[Long](k)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
          out
        } else buf
      }
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      // bounded sorted merge with dedup
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var n = 0
      var last = 0L; var hasLast = false
      while (n < out.length && (i < a.length || j < b.length)) {
        val v =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
          else { val x = b(j); j += 1; x }
        if (!hasLast || v != last) { out(n) = v; n += 1; last = v; hasLast = true }
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }

    /** (k−1)/x_(k) with hashes mapped to (0,1); exact below k. */
    override def finish(buf: Array[Long]): Double =
      if (buf.length < k) buf.length.toDouble
      else {
        val xk = (buf(k - 1).toDouble / 1.8446744073709552e19) + 0.5 // 2^64
        (k - 1).toDouble / xk
      }

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** KMV distinct-order estimate per returnflag next to the exact count
    * and Spark's HLL — the estimator comparison surface. Rows-only
    * (estimates have no engine-portable exact value). */
  val q36KmvSketch: QueryDef = QueryDef.noOracle("q36_kmv_sketch") { (s, dir) =>
    val kmv = udaf(Kmv(256))
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"), xxhash64(col("l_orderkey")).as("h"), col("l_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("exact"),
        round(kmv(col("h")), 1).as("kmv_est"),
        approx_count_distinct(col("l_orderkey")).as("hll_est"))
      .orderBy("l_returnflag")
  }

  val all: Seq[QueryDef] = Seq(q36KmvSketch)
}
