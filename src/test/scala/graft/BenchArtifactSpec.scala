package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Guards the committed bench artifact (written by `graft.Bench` on a
  * FULL-registry run; subset runs deliberately leave it untouched): it
  * must parse, cover every registry query, and record no failures —
  * the driver's BENCH_r{N}.json `parsed` field depends on this file
  * staying a complete single-line JSON dict. Regenerate with
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.Bench"`. */
class BenchArtifactSpec extends AnyFunSuite {

  private val path = Paths.get(sys.props.getOrElse("graft.bench.json",
    "bench.json"))

  test("bench.json exists, parses, and records no failed query") {
    assume(Files.exists(path), "bench.json not generated in this checkout")
    val json = Files.readString(path)
    val failed = """"failed"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(json)
    assert(failed.isDefined, "artifact must carry a failed list")
    assert(failed.get.group(1).trim.isEmpty,
      s"failed queries recorded: ${failed.get.group(1)}")
  }

  test("bench.json covers every registry query with a numeric time") {
    assume(Files.exists(path), "bench.json not generated in this checkout")
    val json = Files.readString(path)
    val qm = """"queries"\s*:\s*\{""".r.findFirstMatchIn(json)
    assert(qm.isDefined, "artifact must carry the per-query dict")
    SparkEntry.queries.keys.foreach { name =>
      val entry = ("\"" + java.util.regex.Pattern.quote(name) +
        "\"\\s*:\\s*([0-9.]+|null)").r.findFirstMatchIn(json)
      assert(entry.isDefined,
        s"query $name missing from bench.json — stale artifact; " +
          "re-run the full bench")
      assert(entry.get.group(1) != "null",
        s"query $name has no time in bench.json (failed run?)")
    }
  }
}
