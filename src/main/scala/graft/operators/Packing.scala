package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Sequence packing — the training-data step that bins documents into
  * fixed token-budget context windows (greedy first-fit in a
  * deterministic document order, the standard pretraining packer).
  *
  * Packing is inherently SEQUENTIAL within a shard (each placement
  * depends on the running fill), so this is the codebase's one
  * legitimate per-partition imperative loop: repartition by source
  * (the parallel unit — at 100 TB, the shard), sort within partitions
  * by (source, doc_id) — the classic secondary-sort shape, ONE
  * shuffle — then a single forward scan assigns bins with O(1) state.
  * Parallelism is across sources/shards, exactly how production
  * packers shard.
  *
  * The oracle replays the same greedy recurrence as a recursive CTE
  * (row-at-a-time over the per-source rank), so the driver hash gate
  * proves the distributed secondary-sort scan equals the sequential
  * definition. All arithmetic is integer — no float drift anywhere.
  */
object Packing {

  private val CAPACITY = 512 // tokens per context window

  val q87Packing: QueryDef = QueryDef(
    "q87_packing",
    s"""WITH RECURSIVE t AS (
       |  SELECT source, doc_id,
       |    CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS tok,
       |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
       |  FROM documents
       |  WHERE source IS NOT NULL AND text IS NOT NULL),
       |pack AS (
       |  SELECT source, rn, tok, CAST(1 AS BIGINT) AS bin, tok AS cur
       |  FROM t WHERE rn = 1
       |  UNION ALL
       |  SELECT t.source, t.rn, t.tok,
       |    CASE WHEN p.cur + t.tok > $CAPACITY THEN p.bin + 1 ELSE p.bin END,
       |    CASE WHEN p.cur + t.tok > $CAPACITY THEN t.tok ELSE p.cur + t.tok END
       |  FROM pack p JOIN t ON t.source = p.source AND t.rn = p.rn + 1)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(tok) AS BIGINT) AS total_toks,
       |  max(bin) AS n_bins,
       |  (1000 * CAST(sum(tok) AS BIGINT)) // (max(bin) * $CAPACITY) AS fill_permille
       |FROM pack GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    import s.implicits._
    // null guard mirrors the oracle's WHERE: a NULL source would slip
    // past the `!=` boundary check (null == null in Scala) and a NULL
    // text would crash the non-nullable tuple encoder
    val toks = Tables.documents(s, dir)
      .filter(col("source").isNotNull && col("text").isNotNull)
      .select(
        col("source"), col("doc_id"),
        size(split(col("text"), "\\s+")).cast("long").as("tok"))
    val packed = toks
      .repartition(col("source"))
      .sortWithinPartitions("source", "doc_id")
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        // sequential greedy fill; state resets at each source boundary
        var src: String = null
        var bin = 0L
        var cur = 0L
        it.map { case (source, docId, tok) =>
          if (source != src) { src = source; bin = 1L; cur = tok }
          else if (cur + tok > CAPACITY) { bin += 1; cur = tok }
          else cur += tok
          (source, docId, tok, bin)
        }
      }
      .toDF("source", "doc_id", "tok", "bin")
    packed.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("tok")).as("total_toks"),
        max(col("bin")).as("n_bins"))
      .withColumn("fill_permille",
        expr(s"(1000 * total_toks) div (n_bins * $CAPACITY)"))
      .orderBy("source")
  }

  val all: Seq[QueryDef] = Seq(q87Packing)
}
