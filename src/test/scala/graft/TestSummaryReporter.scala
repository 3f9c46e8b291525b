package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.Reporter
import org.scalatest.events._

/** Writes `target/test_summary.json` at the end of every `sbt test`
  * run — the measured (suites, tests, failures) triple, so docs and
  * commit messages quote an artifact instead of a hand count.
  * Wired via `Test / testOptions += Tests.Argument("-C", ...)` in
  * build.sbt. Counters are atomics because sbt runs suites in
  * parallel; RunCompleted fires once, after all of them. */
class TestSummaryReporter extends Reporter {
  import TestSummaryReporter._

  override def apply(event: Event): Unit = event match {
    case _: TestSucceeded => succeeded.incrementAndGet()
    case _: TestFailed    => failed.incrementAndGet()
    case _: TestCanceled  => canceled.incrementAndGet()
    case _: TestIgnored   => ignored.incrementAndGet()
    case _: SuiteCompleted => suites.incrementAndGet()
    case _: SuiteAborted  => aborted.incrementAndGet()
    case _: RunCompleted | _: RunStopped | _: RunAborted =>
      val json =
        s"""{"suites": ${suites.get}, "suites_aborted": ${aborted.get}, """ +
          s""""tests": ${succeeded.get + failed.get}, """ +
          s""""succeeded": ${succeeded.get}, "failed": ${failed.get}, """ +
          s""""canceled": ${canceled.get}, "ignored": ${ignored.get}}"""
      val out = Paths.get("target/test_summary.json")
      Files.createDirectories(out.getParent)
      Files.writeString(out, json + "\n")
    case _ => ()
  }
}

object TestSummaryReporter {
  private val succeeded = new AtomicInteger
  private val failed = new AtomicInteger
  private val canceled = new AtomicInteger
  private val ignored = new AtomicInteger
  private val suites = new AtomicInteger
  private val aborted = new AtomicInteger
}
