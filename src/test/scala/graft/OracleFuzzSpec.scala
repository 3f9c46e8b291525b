package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.scalacheck.{Gen, Prop, Properties}

/** Property fuzz for the oracle-portability contracts — the JVM half
  * of the two-part fuzz harness (`tools/fuzz_oracle.py` is the other
  * half: it redraws whole corpora and replays the real Spark-vs-DuckDB
  * gate; it caught q86's malformed-JSON divergence on its first seed).
  *
  * Every oracle twin leans on a cross-engine arithmetic contract that
  * the single generated corpus exercises at only a few thousand
  * points. These properties hammer the contracts themselves with
  * random inputs, so a violation fails HERE with a named law instead
  * of surfacing as an unexplained hash mismatch two rounds later
  * (the round-2 HUGEINT class).
  */
object OracleFuzzSpec extends Properties("oracle-portability") {

  // ---- the q01 decimal contract: raw <= 2dp doubles are TIE-FREE ----
  // Spark casts double -> DECIMAL with HALF_UP, DuckDB with HALF_EVEN;
  // the contract says casting the RAW 2dp column is portable because a
  // k/100 double can never land exactly on a .005 tie. If this law
  // broke, q01/q119/q131's cast-before-multiply pattern would diverge.
  property("2dp-grid doubles never tie under scale-2 rounding (HALF_UP == HALF_EVEN)") =
    Prop.forAll(Gen.choose(0L, 100000000L)) { k =>
      val x = k / 100.0
      val exact = new JBigDecimal(x) // the double's exact binary value
      exact.setScale(2, RoundingMode.HALF_UP) ==
        exact.setScale(2, RoundingMode.HALF_EVEN)
    }

  // ---- the half-up cents rule: floor(x*100 + 0.5) as pure IEEE ----
  // both engines evaluate the expression with the same IEEE ops, so
  // the JVM reference IS the contract; and on the 2dp grid it must
  // recover the integer cents exactly (q131's header side)
  property("floor(x*100 + 0.5) recovers exact cents on the 2dp grid") =
    Prop.forAll(Gen.choose(0L, 100000000L)) { k =>
      math.floor(k / 100.0 * 100 + 0.5).toLong == k
    }

  // ---- div vs // : the clamp law behind q134 ----
  // Spark's div truncates toward zero; DuckDB's // floors. They agree
  // only for non-negative numerators — and greatest(0, .) restores
  // agreement for ALL signs because both land <= 0 on a negative
  // numerator. This is the exact soundness argument of q134's clamp.
  property("greatest(0, a div b) == greatest(0, a // b) for every sign of a") =
    Prop.forAll(Gen.choose(-1000000L, 1000000L), Gen.choose(1L, 99999L)) { (a, b) =>
      val sparkDiv = a / b                 // JVM / == Spark div (truncate)
      val duckDiv = Math.floorDiv(a, b)    // DuckDB // (floor)
      val agree = math.max(0L, sparkDiv) == math.max(0L, duckDiv)
      val agreeUnclamped = a < 0 || sparkDiv == duckDiv
      agree && agreeUnclamped
    }

  // ---- the scaled-ppm pattern: (1000000 * a) div b stays exact ----
  // int64 headroom law the conf_ppm/recall_ppm family relies on:
  // the numerator is exact whenever a < 9.2e12
  property("ppm numerators below 9.2e12 never overflow int64") =
    Prop.forAll(Gen.choose(0L, 9200000000000L)) { a =>
      val n = 1000000L * a
      n >= 0 && n / 1000000L == a
    }

  // ---- the q108/q123/q124 escape hatch: left-associated double chains ----
  // when int64 would overflow, both engines compute the SAME IEEE
  // double expression tree; the JVM mirror of that tree is the
  // reference. The law worth pinning: the chain is order-SENSITIVE
  // (reassociation changes bits), which is exactly why every oracle
  // writes it left-associated on both sides.
  property("left-associated double chains are deterministic and order-sensitive") =
    Prop.forAll(Gen.listOfN(8, Gen.choose(-1e9, 1e9))) { xs =>
      val l1 = xs.foldLeft(0.0)(_ + _)
      val l2 = xs.foldLeft(0.0)(_ + _)
      // deterministic: same fold, same bits. (Reversing the fold CAN
      // change bits — not asserted, but that possibility is the reason
      // the contract fixes the association order.)
      java.lang.Double.doubleToLongBits(l1) ==
        java.lang.Double.doubleToLongBits(l2)
    }

  // ---- the ntile law behind q119/q129's distributed rewrite ----
  // closed-form ntile-from-rank must equal the SQL-standard
  // definition for EVERY (n, k, rank), not just the shapes the
  // corpus produces (ScaleRankSpec checks against Spark's window on
  // fixed shapes; this is the same law as pure arithmetic)
  property("ntileFromRank formula matches the SQL-standard tile assignment") =
    Prop.forAll(Gen.choose(1L, 5000L), Gen.choose(1, 12)) { (n, k) =>
      // independent reference: materialize the tiles (first n mod k
      // tiles one row bigger) and look each rank up in them
      val base = n / k
      val rem = n % k
      val sizes = (1 to k).map(i => if (i <= rem) base + 1 else base)
      val cum = sizes.scanLeft(0L)(_ + _).tail
      val cut = rem * (base + 1)
      (1L to n).forall { rk =>
        val want = cum.indexWhere(_ >= rk) + 1
        val inBig = rk - 1
        val inSmall = rk - cut - 1
        val got = // the formula ScaleRank.ntileFromRank evaluates
          if (rk <= cut) (inBig - mod(inBig, base + 1)) / (base + 1) + 1
          else rem + (inSmall - mod(inSmall, base)) / base + 1
        got == want
      }
    }

  // ---- the q178 closed form: CUSUM recursion == prefix-sum/run-min ----
  // the batch query computes S_t = P_t − min(0, min_{j≤t} P_j); the
  // definition is the clamped recursion S_t = max(0, S_{t−1} + y_t).
  // Equality for EVERY series is what lets the streaming twin keep
  // O(1) state instead of replaying history.
  property("CUSUM closed form equals the clamped recursion on any series") =
    Prop.forAll(Gen.listOfN(40, Gen.choose(-100000L, 100000L))) { ys =>
      val prefix = ys.scanLeft(0L)(_ + _).tail
      val closed = prefix.zipWithIndex.map { case (p, i) =>
        p - math.min(0L, prefix.take(i + 1).min)
      }
      val rec = ys.scanLeft(0L)((s, y) => math.max(0L, s + y)).tail
      closed == rec
    }

  // ---- the q179 hash headroom law ----
  // event_id is reduced mod 1000003 BEFORE mixing; the law: for every
  // reduced residue and replicate index the mixed product fits int64
  // (the unreduced id would overflow around 3.5e9). Overflow here
  // would wrap in Spark and ERROR in DuckDB — the q107 class.
  property("q179 mixed hash never overflows int64 for any residue and replicate") =
    Prop.forAll(Gen.choose(0L, 1000002L), Gen.choose(1L, 32L)) { (m, b) =>
      val x = m * 2654435761L + b * 40503L
      x >= 0 && x / 2654435761L >= m - 1 // no wrap occurred
    }

  // ---- the q170 dyadic renormalization law ----
  // short prefixes renormalize: for any window of 1..8 values the
  // weighted mean with weights 2^(depth−1−lag) lies within the value
  // range — the property that makes the smoother safe with no warm-up
  // special case (and num/den stay far inside int64 for cents).
  property("dyadic EWMA stays inside the window's value range") =
    Prop.forAll(Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0L, 5000000000L)))) { vs =>
      val l = vs.size
      val wgts = vs.indices.map(i => 1L << (7 - (l - 1 - i)))
      val num = vs.zip(wgts).map { case (v, w) => v * w }.sum
      val den = wgts.sum
      val e = num / den
      e >= vs.min - 1 && e <= vs.max
    }

  // ---- the q199/q206-twin entropy range law ----
  // the literal five-term ln chain must land every mix inside
  // [0, 1000·ln 5] milli-nats AFTER the floor — a value outside the
  // range means the chain's sign or a 0·ln 0 branch broke, which
  // would shift histogram bins on both engines (silently, since the
  // hash would still match a consistently-wrong twin)
  property("five-way entropy chain lands in [0, 1609] milli-nats for every mix") =
    Prop.forAll(Gen.listOfN(5, Gen.choose(0L, 100000L))) { cs =>
      val n = cs.sum
      (n == 0L) || {
        val h = cs.foldLeft(0.0) { (acc, c) =>
          if (c > 0) acc + (c.toDouble / n) * math.log(c.toDouble / n) else acc
        }
        val milli = math.floor(-1000.0 * h).toLong
        milli >= 0L && milli <= 1609L
      }
    }

  // ---- the q200/q211 dispersion non-negativity law ----
  // DI's numerator n·Q − S² is ≥ 0 by Cauchy–Schwarz over the integer
  // counts, which is what licenses the non-negative floor-div (the
  // Spark-div ≡ DuckDB-// domain); a violation would flip the engines
  // apart on the sign
  property("dispersion numerator n*Q - S^2 is non-negative for any count vector") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(0L, 100000L))) { cs =>
      val n = BigInt(cs.size)
      val s = cs.map(BigInt(_)).sum
      val q = cs.map(c => BigInt(c) * c).sum
      n * q - s * s >= 0
    }

  // ---- the q204 Haar mass-conservation law ----
  // each level's detail coefficient is a signed sum of the block's
  // day values, so |dcoef| can never exceed the block's absolute
  // mass, and the level-k L1 detail mass is bounded by the series'
  // total |mass| — the bound that keeps l1_detail_cents inside int64
  // whenever total revenue cents is
  property("Haar detail mass never exceeds the series' absolute mass") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(0L, 1000000L)), Gen.choose(1, 4)) { (days, k) =>
      val blocks = days.zipWithIndex.groupBy(_._2 >> k)
      val l1 = blocks.values.map { blk =>
        math.abs(blk.map { case (c, i) =>
          if (((i >> (k - 1)) & 1) == 0) c else -c
        }.sum)
      }.sum
      l1 <= days.sum
    }

  private def mod(a: Long, m: Long): Long = ((a % m) + m) % m // pmod
}
