package graft.queries

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** The driver-compute counterpart of [[PlanSweepSpec]]: plan shapes are
  * swept mechanically there, but a `.collect()` never shows up in a
  * logical plan — it IS the action. So this spec sweeps the SOURCE for
  * every materialize-to-driver call (`collect()`, `collectAsList()`,
  * `toLocalIterator`) under `src/main` and requires each site to carry
  * a registered bound in [[DriverComputeRegistry]].
  *
  * Both directions are enforced, like the plan-sweep allowlist: an
  * unregistered site fails (a new driver loop must name its bound
  * before it ships), and a registry entry whose site disappeared fails
  * too (stale adjudications rot the audit).
  *
  * Driver-side `.head()` on a 1-row aggregate and `rows.toDF` loop
  * scalars are deliberately out of scope: they move O(1) rows by
  * construction. What this catches is the O(data) class — pulling a
  * frame whose size is NOT provably bounded into driver memory.
  */
class DriverComputeSweepSpec extends AnyFunSuite {
  private val root = Paths.get("src/main/scala/graft")
  private val call = raw"\.collect\(\)|\.collectAsList\(\)|\.toLocalIterator".r

  test("every driver-materialize site in src/main is registered with a bound") {
    val hits: Seq[(String, String)] = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .flatMap { p: Path =>
        Files.readAllLines(p).asScala.zipWithIndex.collect {
          case (line, _) if call.findFirstIn(line).isDefined &&
            !line.trim.startsWith("//") && !line.trim.startsWith("*") =>
            (root.relativize(p).toString, line.trim)
        }
      }.toSeq
    val unmatched = hits.filterNot { case (f, line) =>
      DriverComputeRegistry.sites.exists { case (rf, marker, _) =>
        rf == f && line.contains(marker)
      }
    }
    assert(unmatched.isEmpty,
      "driver-materialize calls without a registered bound (add to " +
        s"DriverComputeRegistry with the bound that keeps them O(small)):\n" +
        unmatched.map { case (f, l) => s"  $f: $l" }.mkString("\n"))
    val stale = DriverComputeRegistry.sites.filterNot { case (rf, marker, _) =>
      hits.exists { case (f, line) => f == rf && line.contains(marker) }
    }
    assert(stale.isEmpty,
      s"registry entries whose site no longer exists:\n" +
        stale.map { case (f, m, _) => s"  $f [$m]" }.mkString("\n"))
  }
}

/** Declared driver-compute sites: (file under graft/, line marker,
  * the bound that keeps the pull O(small) at any data scale). */
object DriverComputeRegistry {
  val sites: Seq[(String, String, String)] = Seq(
    ("operators/Dedup.scala", ".collect() // bounded: kernelMaxRows dispatch",
      "q34 AllPairs postings kernel input: gated by KERNEL_MAX_ROWS " +
        "(3M exploded (doc,key) rows — measured crossover) in " +
        "bigramPairInter; above it the " +
        "shuffle count-join path runs — the ConnectedComponents-style " +
        "size dispatch"),
    ("operators/Linalg.scala", "g.collect() // bounded: d*d = 4096",
      "q169 Gram matrix: d² = 4096 dimension-lattice cells, constant " +
        "at any corpus size — the power rounds are exact BigInt driver " +
        "arithmetic over it (q246/q251 class)"),
    ("operators/Layout.scala", "lat.collect() // bounded: 2^3 = 8",
      "q289 HRU greedy input: the cuboid lattice of 3 cube attributes " +
        "— 2^3 = 8 rows by construction at any corpus size; the greedy " +
        "rounds are exact integer driver arithmetic (q169/q246 class)"),
    ("operators/TextAnalysis.scala", ".collect() // bounded: source domain",
      "q254 source→bit mapping: distinct document sources — the ≤~20 " +
        "value source domain (the q330/q345 PipelineFilters class), " +
        "guarded by an explicit require(≤62) before any mask is built"),
    ("operators/ConnectedComponents.scala", "edges.as[(Long, Long)].collect()",
      "gated by driverLimit (default 5M edges) in compute/computeCkpt; " +
        "above it the property-tested distributed min-label path runs"),
    ("operators/PipelineFilters.scala", "collect().sortBy(_.getAs[Int](\"rk\"))",
      "q330/q345 knapsack DP input: a groupBy(source) aggregate frame, " +
        "<= |sources| rows (source domain, not data volume)"),
    ("operators/Forecast.scala", "daily.orderBy(\"d\").collect()",
      "q372 DTW DP input: the (day, clicks, purchases) collapse — " +
        "calendar-bounded (~37k rows/century), the adjudicated day-axis " +
        "bound; the DP is inherently sequential, the distributed path " +
        "is the relational LB_Keogh prune computed alongside"),
    ("operators/EventOps.scala", "<= 16*6 scenario-state rows",
      "q246/q251 value-iteration states: scenario axis is a literal " +
        "mask/channel lattice (<= 16), states the categorical event-type " +
        "domain (<= 6) — bounded by spec constants, not data volume"),
    ("operators/EventOps.scala", "<= 16*6 conversion rows",
      "q246/q251 conversion vector: same scenario x state bound"),
    ("operators/EventOps.scala", "<= 16*30 transition rows",
      "q246/q251 transition matrix: scenario x (state x state) over " +
        "the categorical event-type domain — spec-bounded; the 8-round " +
        "iteration is inherently sequential (VERDICT r8 item 3 fold, " +
        "the q345 knapsack adjudication)"))
}
