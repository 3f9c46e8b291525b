package graft.operators

import graft.CkptOps

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Bitmap-index set algebra — exact multi-set user overlap without a
  * distinct or a self-join of the fact table: each event type's user
  * set becomes a bitmap sharded into 32-bit words ((word, bits) rows,
  * built by one `bit_or` aggregate that absorbs duplicates for free),
  * and every set operation is then word-aligned integer logic:
  * |A| = Σ bit_count(bits), |A∩B| = Σ bit_count(a & c) over the
  * word-equi-join. The roaring-bitmap/bitmap-index pattern OLAP
  * engines use for segment overlap, expressed relationally.
  *
  * Scale design: the fact table reduces to ≤ |types|·(maxUser/32)
  * bitmap rows in ONE partial-aggregable shuffle (bit_or combines
  * map-side); all pairwise intersections run on the bitmap table.
  * 32-bit words in an int64 column keep every shift/AND inside
  * portable non-negative arithmetic. */
object Bitmap {

  val q141BitmapIndex: QueryDef = QueryDef(
    "q141_bitmap_index",
    """WITH b AS (
      |  SELECT event_type, user_id // 32 AS w,
      |    bit_or(CAST(1 AS BIGINT) << CAST(user_id % 32 AS INT)) AS bits
      |  FROM events GROUP BY 1, 2),
      |n AS (SELECT event_type, CAST(sum(bit_count(bits)) AS BIGINT) AS n_users
      |      FROM b GROUP BY 1),
      |p AS (
      |  SELECT a.event_type AS type_a, c.event_type AS type_b,
      |    CAST(sum(bit_count(a.bits & c.bits)) AS BIGINT) AS n_both
      |  FROM b a JOIN b c ON a.w = c.w AND a.event_type < c.event_type
      |  GROUP BY 1, 2)
      |SELECT p.type_a, p.type_b, na.n_users AS n_a, nb.n_users AS n_b, p.n_both
      |FROM p JOIN n na ON p.type_a = na.event_type
      |       JOIN n nb ON p.type_b = nb.event_type
      |ORDER BY type_a, type_b""".stripMargin) { (s, dir) =>
    val b = Tables.events(s, dir)
      .select(col("event_type"), expr("user_id div 32").as("w"),
        expr("shiftleft(cast(1 as bigint), cast(user_id % 32 as int))").as("m"))
      .groupBy(col("event_type"), col("w"))
      .agg(expr("bit_or(m)").as("bits"))
      .ckpt() // counts + both sides of the word join
    val n = b.groupBy(col("event_type"))
      .agg(expr("cast(sum(bit_count(bits)) as bigint)").as("n_users"))
    val p = b.select(col("event_type").as("type_a"), col("w"), col("bits").as("ba"))
      .join(b.select(col("event_type").as("type_b"), col("w"), col("bits").as("bb")),
        Seq("w"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(expr("cast(sum(bit_count(ba & bb)) as bigint)").as("n_both"))
    p.join(broadcast(n.select(col("event_type").as("type_a"), col("n_users").as("n_a"))),
        Seq("type_a"))
      .join(broadcast(n.select(col("event_type").as("type_b"), col("n_users").as("n_b"))),
        Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"), col("n_both"))
      .orderBy("type_a", "type_b")
  }

  val all: Seq[QueryDef] = Seq(q141BitmapIndex)
}
