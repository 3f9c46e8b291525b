package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus invariants the DuckDB oracle twins RELY on but do not check
  * per-run. Each test pins one assumption against every shipped scale
  * factor, so a future data-generator change produces a targeted test
  * failure naming the broken contract instead of a puzzling hash
  * mismatch in the correctness gate.
  */
class OracleInvariantsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // the gates run at sf0.01 (verify) and sf0.1 (bench); sf0.001 is the
  // smoke scale — pin all three
  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  test("q24/q61/q234 byte-hash oracles: documents.text is pure ASCII") {
    // the oracles replay JVM byte hashes via DuckDB ord() codepoints,
    // which equal signed UTF-8 bytes only for ASCII text (q234's
    // winnowing gram hashes ride the same contract)
    for (dir <- sfDirs) {
      val nonAscii = Tables.documents(spark, dir)
        .filter(!col("text").rlike("^[\\x00-\\x7F]*$"))
        .count()
      assert(nonAscii == 0L, s"$dir: $nonAscii non-ASCII documents " +
        "break the ord()-as-byte oracle twins of q24/q61")
    }
  }

  test("q34 DF cap is inert: no (lang, bigram) document frequency reaches NGRAM_DF_CAP") {
    // bigramPairInter drops over-cap keys on the Spark side while the
    // oracle stays the exact quadratic formulation — equality holds
    // only while the cap never fires on gated data
    for (dir <- sfDirs) {
      val maxDf = operators.Dedup.bigramSets(Tables.documents(spark, dir))
        .select(col("lang"), explode(col("bs")).as("bigram"))
        .groupBy(col("lang"), col("bigram"))
        .agg(count(lit(1)).as("df"))
        .agg(max(col("df")))
        .head().getLong(0)
      assert(maxDf < operators.Dedup.NGRAM_DF_CAP,
        s"$dir: max bigram df $maxDf reaches NGRAM_DF_CAP " +
          s"(${operators.Dedup.NGRAM_DF_CAP}) — the perf knob would " +
          "silently become an oracle mismatch in q34")
    }
  }

  test("q86 variant oracle: every events.props.k is a JSON number < 2^53 or a non-numeric string") {
    // the oracle twin (json_extract_string -> TRY_CAST DOUBLE -> trunc)
    // matches try_variant_get(v,'$.k','bigint') only on that domain:
    // a numeric STRING ("5.5"), a boolean, or |k| >= 2^53 all diverge
    for (dir <- sfDirs) {
      // to_json renders the variant value as its JSON literal text:
      // numbers bare, strings quoted, booleans as true/false
      val kJson = to_json(expr("variant_get(try_parse_json(props), '$.k')"))
      val isNumber = col("k_json").rlike("^-?[0-9]+(\\.[0-9]+)?([eE][+-]?[0-9]+)?$")
      val inRange = abs(col("k_json").cast("double")) < lit(math.pow(2, 53))
      val quoted = regexp_extract(col("k_json"), "^\"(.*)\"$", 1)
      val nonNumericString = col("k_json").startsWith("\"") &&
        !quoted.rlike("^\\s*-?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)([eE][+-]?[0-9]+)?\\s*$")
      val offenders = Tables.events(spark, dir)
        .select(kJson.as("k_json"))
        .filter(col("k_json").isNotNull)
        .filter(!((isNumber && inRange) || nonNumericString))
        .limit(5).collect()
      assert(offenders.isEmpty, s"$dir: props.k values outside the " +
        s"pinned domain (first 5): ${offenders.mkString(", ")} — " +
        "q86's oracle twin diverges from variant cast semantics here")
    }
  }

  test("q113/q114/q124 int64 bounds: events.value in [0, 1e6) milli-units") {
    // the rolling z-score cross-multiplication (n·v−s)², the TWAP
    // weight products, and the regression moments all stay inside
    // int64 only while |value·1000| < 10⁶ (derivations in the
    // respective scaladocs); a generator change to bigger values
    // must fail HERE, not as an overflowed hash mismatch
    for (dir <- sfDirs) {
      val offenders = Tables.events(spark, dir)
        .filter(col("value") < 0 || col("value") >= 1000.0)
        .count()
      assert(offenders == 0L, s"$dir: $offenders events.value rows " +
        "outside [0, 1000) break the milli-unit int64 bound")
    }
  }

  test("q124 slope numerator |n*sxy|, |sx*sy| keep int64 headroom at every scale") {
    // the regression's slope numerator n·Σxy − Σx·Σy is the thinnest
    // int64 margin in the surface (~7.4e18 of 9.2e18 at sf0.1, and it
    // grows ~quadratically with rows·timespan): measure the ACTUAL
    // moments exactly in decimal and fail here — naming the margin —
    // before a bigger generator turns silent Spark wrap vs DuckDB
    // overflow-error into a hash mismatch
    val i64 = BigDecimal(Long.MaxValue)
    for (dir <- sfDirs) {
      val ev = Tables.events(spark, dir)
      val m0 = ev.agg(min(expr("unix_micros(ts) div 1000000")).as("t0"))
      val p = ev.crossJoin(broadcast(m0)).select(
        col("event_type"),
        expr("(unix_micros(ts) div 1000000 - t0) div 3600")
          .cast("decimal(18,0)").as("x"),
        floor(col("value") * 1000).cast("decimal(18,0)").as("y"))
      val rows = p.groupBy(col("event_type"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .collect()
      for (r <- rows) {
        val Seq(n, sx, sy, sxy, sxx) = (1 to 5).map(i => BigDecimal(r.getDecimal(i)))
        val worst = Seq(n * sxy, sx * sy, n * sxx, sx * sx).map(_.abs).max
        assert(worst < i64,
          s"$dir/${r.getString(0)}: q124 moment product $worst exceeds " +
            "int64 — the slope arithmetic would wrap in Spark and error in DuckDB")
      }
    }
  }

  test("q115 pair keys: doc_id < 1e6 so a*1000000+b is injective") {
    // the phash report's min/max pair keys pack two doc_ids into one
    // int64 with a 10^6 radix; a corpus with bigger ids needs a wider
    // radix and must fail HERE, not as a silent key collision
    for (dir <- sfDirs) {
      val mx = Tables.documents(spark, dir)
        .agg(max(col("doc_id"))).head().getLong(0)
      assert(mx < 1000000L, s"$dir: max doc_id $mx breaks the pair-key radix")
    }
  }

  test("q208 pack radix: every o_orderkey is below 1e10") {
    // the bitemporal belief key packs day*1e10 + orderkey into one
    // BIGINT; an orderkey at or past the radix would collide two
    // observations and silently corrupt the arg-max
    for (dir <- sfDirs) {
      val mx = Tables.orders(spark, dir)
        .agg(max(col("o_orderkey"))).head().getLong(0)
      assert(mx < 10000000000L,
        s"$dir: max o_orderkey $mx breaks the q208 pack radix")
    }
  }

  test("q201-q203 bucket shift: every c_acctbal is above -$100k") {
    // the privacy audits shift balance cents by +10^7 before the
    // integral division so Spark's truncating div and DuckDB's
    // flooring // agree; a balance at or below -$100,000.00 would
    // make the shifted numerator negative and the engines diverge
    for (dir <- sfDirs) {
      val mn = Tables.customer(spark, dir)
        .agg(min((col("c_acctbal").cast("decimal(12,2)") * 100)
          .cast("bigint"))).head().getLong(0)
      assert(mn > -10000000L,
        s"$dir: min acctbal cents $mn breaks the q201-q203 bucket shift")
    }
  }

  test("q203 ladder: k=5 risk is monotonically non-increasing as QI coarsens") {
    // the generalization ladder's whole point — merging groups can
    // only grow group sizes, so rows-at-risk(k) must not increase
    // down the ladder; a violation means the level keys drifted apart
    for (dir <- sfDirs) {
      val rows = operators.Privacy.q203GeneralizationLadder
        .build(spark, dir).orderBy("level").collect()
      val risk = rows.map(r => r.getLong(r.fieldIndex("rows_at_risk")))
      for (i <- 1 until risk.length)
        assert(risk(i) <= risk(i - 1),
          s"$dir: rows_at_risk ${risk.mkString(",")} is not monotone")
    }
  }
}
