package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source-level gate-name uniqueness: `SparkEntry.mergeGates` throws on
  * duplicate keys ACROSS the five query files, but a duplicate key
  * inside ONE Map literal dedups before mergeGates ever sees it — the
  * last entry silently shadows the first (it happened twice: round 13's
  * q_sessionize and round 14's q_calibration, each discovered only when
  * a gate returned the wrong schema). This spec scans the query sources
  * for `"name" ->` bindings: each gate name may appear at most twice —
  * once per map — attributed to the `queries` or `oracles` val whose declaration precedes the binding.
  */
class GateUniquenessSpec extends AnyFunSuite {

  test("no gate name binds more than once per map across the query files") {
    val dir = new java.io.File("src/main/scala/graft/queries")
    assert(dir.isDirectory, s"missing ${dir.getPath} (run from the repo root)")
    val binding = """"([A-Za-z0-9_]+)"\s*->""".r
    // attribute every binding to the val whose declaration precedes it —
    // the round-14 form counted `<= 2` ACROSS both maps, which missed the
    // exact shadowing class it guards against for a gate bound twice in
    // `queries` but absent from `oracles` (or vice versa)
    // the type ascription anchors the match to the MAP declarations —
    // gate bodies bind local vals named `queries` too
    val section = """(?:val|def)\s+(queries|oracles)\s*:\s*Map\[""".r
    val counts = scala.collection.mutable.Map.empty[(String, String), Int]
    dir.listFiles().filter(_.getName.endsWith(".scala")).foreach { f =>
      val src = scala.io.Source.fromFile(f, "UTF-8")
      val text = try src.mkString finally src.close()
      val markers = section.findAllMatchIn(text)
        .map(m => (m.start, m.group(1))).toSeq.sortBy(_._1)
      binding.findAllMatchIn(text).foreach { m =>
        markers.takeWhile(_._1 < m.start).lastOption.foreach { case (_, sec) =>
          val key = (sec, m.group(1))
          counts.update(key, counts.getOrElse(key, 0) + 1)
        }
      }
    }
    // only actual gate names — gates' bodies bind unrelated string keys
    // ("src0" -> …) that are not gate map entries
    val gateNames = SparkEntry.queries.keySet
    val offenders = counts
      .filter { case ((_, k), n) => gateNames(k) && n > 1 }
      .toSeq.sortBy(_._1)
    assert(offenders.isEmpty,
      s"gate names bound more than once within a single map: " +
        offenders.map { case ((sec, k), n) => s"$k x$n in $sec" }
          .mkString(", ") +
        " — a duplicate key inside one Map literal shadows silently")
    // sanity: the scan actually attributed bindings to both map kinds
    assert(counts.keys.exists(_._1 == "queries"))
    assert(counts.keys.exists(_._1 == "oracles"))
  }
}
