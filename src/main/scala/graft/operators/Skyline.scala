package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Skyline (Pareto frontier) — the parts no other part beats on both
  * price (minimize) and size (maximize). The multi-criteria shortlist
  * query classic in catalog/offer analytics.
  *
  * Dominance here: q dominates p iff q.price <= p.price AND
  * q.size >= p.size with at least one strict. The oracle states that
  * directly as NOT EXISTS; a distributed engine cannot run that
  * quadratic predicate, so the Spark plan is two prunes:
  *
  *  1. bucket prune — per price-bucket max size (one tiny aggregate,
  *     broadcast back): any row whose size is ≤ the running max of
  *     STRICTLY lower buckets is dominated (bucket order implies
  *     strictly lower price) and is dropped map-side. This is the
  *     scale stage: it eliminates ~everything at any data size while
  *     touching only (bucket, max) pairs.
  *  2. exact stage — per-price max over the few survivors + two
  *     running-max windows: keep p iff max-size over strictly-lower
  *     prices < p.size AND max-size over prices ≤ p.price does not
  *     exceed p.size. Sound because dominance is transitive, so every
  *     dominated row has a SKYLINE dominator, and skyline rows always
  *     survive stage 1.
  *
  * Both stages run over price LEVELS (bounded by price cardinality),
  * never over rows — and their running maxes ride
  * [[ScaleRank.withRunningMax]], so even a catalog whose distinct
  * price count grows with data never produces a single-task sort. */
object Skyline {

  /** The two-stage frontier over (p_retailprice min, p_size max);
    * input needs columns p_partkey, p_name, p_retailprice, p_size. */
  def skyline(part: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val bucketed = part.withColumn("bkt", floor(col("p_retailprice")).cast("long"))
    // stage 1: per-bucket max size from the FULL table (so the prune
    // is sound on its own), running max over strictly lower buckets
    val bmax = bucketed.groupBy(col("bkt")).agg(max(col("p_size")).as("bsz"))
    val bdom = ScaleRank
      .withRunningMax(bmax, Nil, Seq(col("bkt")), col("bsz"),
        "lower_max", inclusive = false)
      .select(col("bkt"), col("lower_max"))
    val pruned = bucketed.join(broadcast(bdom), Seq("bkt"))
      .filter(col("lower_max").isNull || col("lower_max") < col("p_size"))
    // stage 2: exact frontier over surviving price levels
    val lvl = pruned.groupBy(col("p_retailprice")).agg(max(col("p_size")).as("lmax"))
    val dec = ScaleRank
      .withRunningMax(
        ScaleRank.withRunningMax(lvl, Nil, Seq(col("p_retailprice")),
          col("lmax"), "a_excl", inclusive = false),
        Nil, Seq(col("p_retailprice")), col("lmax"), "b_incl", inclusive = true)
      .select(col("p_retailprice"), col("a_excl"), col("b_incl"))
    pruned.join(broadcast(dec), Seq("p_retailprice"))
      .filter((col("a_excl").isNull || col("a_excl") < col("p_size")) &&
        col("b_incl") <= col("p_size"))
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"), col("p_size"))
      .orderBy(col("p_retailprice"), col("p_partkey"))
  }

  val q110Skyline: QueryDef = QueryDef(
    "q110_skyline",
    """SELECT p_partkey, p_name, p_retailprice, p_size
      |FROM part p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM part q
      |  WHERE (q.p_retailprice < p.p_retailprice AND q.p_size >= p.p_size)
      |     OR (q.p_retailprice <= p.p_retailprice AND q.p_size > p.p_size))
      |ORDER BY p_retailprice, p_partkey""".stripMargin) { (s, dir) =>
    skyline(Tables.part(s, dir)
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"), col("p_size")))
  }

  /** q111 — blocked fuzzy match (record linkage): near-identical part
    * names by edit distance, blocked on the name's noun so the
    * candidate space is linear, not all-pairs.
    *
    * Scale design: linkage runs over the DISTINCT value dictionary
    * (bounded by vocabulary, not row count) with per-name support
    * counts carried along — the standard dictionary-level linkage
    * shape. Within a block the join is equi on the blocking key;
    * levenshtein only runs on candidates. Spark's levenshtein is
    * codegen'd (no UDF). */
  val q111FuzzyMatch: QueryDef = QueryDef(
    "q111_fuzzy_match",
    """WITH d AS (SELECT p_name, CAST(count(*) AS BIGINT) AS n FROM part GROUP BY p_name),
      |t AS (SELECT p_name, n, string_split(p_name, ' ')[2] AS blk FROM d)
      |SELECT a.p_name AS name_a, b.p_name AS name_b,
      |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev,
      |  a.n AS n_a, b.n AS n_b
      |FROM t a JOIN t b ON a.blk = b.blk AND a.p_name < b.p_name
      |WHERE levenshtein(a.p_name, b.p_name) <= 4
      |ORDER BY name_a, name_b""".stripMargin) { (s, dir) =>
    val d = Tables.part(s, dir)
      .groupBy(col("p_name")).agg(count(lit(1)).as("n"))
      .withColumn("blk", element_at(split(col("p_name"), " "), 2))
    val a = d.select(col("p_name").as("name_a"), col("n").as("n_a"), col("blk"))
    val b = d.select(col("p_name").as("name_b"), col("n").as("n_b"), col("blk"))
    a.join(b, Seq("blk"))
      .filter(col("name_a") < col("name_b"))
      // DuckDB levenshtein is BIGINT; Spark's is INT — align the type
      .withColumn("lev", levenshtein(col("name_a"), col("name_b")).cast("bigint"))
      .filter(col("lev") <= 4)
      .select(col("name_a"), col("name_b"), col("lev"), col("n_a"), col("n_b"))
      .orderBy("name_a", "name_b")
  }

  val all: Seq[QueryDef] = Seq(q110Skyline, q111FuzzyMatch)
}
