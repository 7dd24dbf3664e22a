package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Guards the committed scale-trend artifact (written by `graft.Scaling`
  * over sf0.001/0.01/0.1): every query's time ratio across the last 10×
  * data step must stay at-or-below linear — a superlinear query cannot
  * survive the 100 TB design target. Regenerate with
  * `sbt "runMain graft.Scaling"` after operator changes. */
class ScalingArtifactSpec extends AnyFunSuite {

  private val path = Paths.get(sys.props.getOrElse("graft.scaling.json",
    "SCALING.json"))

  test("SCALING.json exists and flags no superlinear query") {
    assume(Files.exists(path), "SCALING.json not generated in this checkout")
    val json = Files.readString(path)
    val m = """"superlinear"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(json)
    assert(m.isDefined, "artifact must carry a superlinear list")
    val flagged = m.get.group(1).trim
    assert(flagged.isEmpty, s"superlinear queries flagged: $flagged")
  }

  test("SCALING.json's expected-superlinear exemption is pinned to the " +
    "documented quadratic baseline only") {
    assume(Files.exists(path), "SCALING.json not generated in this checkout")
    val json = Files.readString(path)
    """"expected_superlinear"\s*:\s*\[([^\]]*)\]""".r
      .findFirstMatchIn(json).foreach { m =>
        val names = m.group(1).split(",").map(_.trim.stripPrefix("\"")
          .stripSuffix("\"")).filter(_.nonEmpty).toSet
        // only the exact all-pairs baseline may ever sit here: it is
        // N²/2 by definition (it exists to verify the approximate
        // paths); anything else appearing means a real operator went
        // quadratic and was exempted instead of fixed
        assert(names.subsetOf(Set("v2_cosine_pairs")),
          s"unexpected exemptions: $names")
      }
  }

  test("SCALING.json records no failed query at any scale rung") {
    assume(Files.exists(path), "SCALING.json not generated in this checkout")
    val json = Files.readString(path)
    val m = """"failed"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(json)
    assert(m.isDefined, "artifact must carry a failed list " +
      "(a query that cannot run at a rung is the worst scale verdict)")
    val failed = m.get.group(1).trim
    assert(failed.isEmpty, s"queries failed during scaling: $failed")
  }

  test("SCALING.json covers every registry query") {
    assume(Files.exists(path), "SCALING.json not generated in this checkout")
    val json = Files.readString(path)
    val missing = SparkEntry.queries.keys.filterNot(n => json.contains("\"" + n + "\""))
    assert(missing.isEmpty, s"queries absent from SCALING.json: $missing")
  }
}
