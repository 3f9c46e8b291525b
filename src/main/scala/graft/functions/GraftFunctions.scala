package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration for the graft native expressions.
  *
  * Two paths to the same registry entries:
  *  - [[GraftFunctions.register]]: imperative, idempotent — called by
  *    query builders so any session (driver's Verify/Bench, tests)
  *    gets the functions without config;
  *  - [[GraftExtensions]]: the `spark.sql.extensions`-config path for
  *    deployments that want the functions present at session build.
  */
object GraftFunctions {

  val all: Seq[(String, Seq[Expression] => Expression, String)] = Seq(
    ("cosine_sim", (es: Seq[Expression]) => CosineSimilarity(es(0), es(1)),
      classOf[CosineSimilarity].getName),
    ("dot_product", (es: Seq[Expression]) => DotProduct(es(0), es(1)),
      classOf[DotProduct].getName),
    ("rolling_hash", (es: Seq[Expression]) => RollingHash(es.head),
      classOf[RollingHash].getName),
    ("lsh_bucket", (es: Seq[Expression]) => LshBucket(es(0),
      LshBucket.litInt(es(1), "planes"), LshBucket.litInt(es(2), "dim")),
      classOf[LshBucket].getName),
    ("char_ngrams", (es: Seq[Expression]) => CharNgrams(es(0),
      LshBucket.litInt(es(1), "n")),
      classOf[CharNgrams].getName),
    // Spark's own codegen'd bloom probe (the InjectRuntimeFilter pair),
    // surfaced by name so operators can pre-prune a join's fact side
    // with a filter built via df.stat.bloomFilter — not in the public
    // registry upstream, but same-process serialization-compatible.
    ("might_contain_bf", (es: Seq[Expression]) =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(es(0), es(1)),
      classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName))

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    all.foreach { case (name, builder, _) =>
      if (!registry.functionExists(FunctionIdentifier(name)))
        registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` entry point:
  * native functions + the top-k planner strategy and optimizer rule. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder, className) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(className, name),
        builder))
    }
    ext.injectPlannerStrategy(_ => new graft.plans.TopKStrategy)
    ext.injectOptimizerRule(_ => graft.plans.RowNumberTopKRewrite)
    // SQL-visible as-of join: TVF + strategy + by-name rewrite
    ext.injectTableFunction((
      FunctionIdentifier("asof_join"),
      graft.plans.AsofSql.info,
      graft.plans.AsofSql.builder))
    ext.injectPlannerStrategy(_ => new graft.plans.AsofJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.ResolveAsofJoinByName)
  }
}
