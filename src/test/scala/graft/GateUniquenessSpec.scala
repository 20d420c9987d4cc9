package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source-level gate-name uniqueness: `SparkEntry.mergeGates` throws on
  * duplicate keys ACROSS the five query files, but a duplicate key
  * inside ONE Map literal dedups before mergeGates ever sees it — the
  * last entry silently shadows the first (it happened twice: round 13's
  * q_sessionize and round 14's q_calibration, each discovered only when
  * a gate returned the wrong schema). This spec scans the query sources
  * for `"name" ->` bindings: each gate name may appear at most twice —
  * once in `queries`, once in `oracleSql`.
  */
class GateUniquenessSpec extends AnyFunSuite {

  test("no gate name binds more than once per map across the query files") {
    val dir = new java.io.File("src/main/scala/graft/queries")
    assert(dir.isDirectory, s"missing ${dir.getPath} (run from the repo root)")
    val binding = """"([A-Za-z0-9_]+)"\s*->""".r
    val counts = scala.collection.mutable.Map.empty[String, Int]
    dir.listFiles().filter(_.getName.endsWith(".scala")).foreach { f =>
      val src = scala.io.Source.fromFile(f, "UTF-8")
      val text = try src.mkString finally src.close()
      binding.findAllMatchIn(text).foreach { m =>
        val k = m.group(1)
        counts.update(k, counts.getOrElse(k, 0) + 1)
      }
    }
    // only actual gate names — gates' bodies bind unrelated string keys
    // ("src0" -> …) that are not gate map entries
    val gateNames = SparkEntry.queries.keySet
    val offenders = counts.filter { case (k, n) => gateNames(k) && n > 2 }
      .toSeq.sortBy(_._1)
    assert(offenders.isEmpty,
      s"gate names bound more than twice (query + oracle): " +
        offenders.map { case (k, n) => s"$k x$n" }.mkString(", ") +
        " — a duplicate key inside one Map literal shadows silently")
    // and every gate in the merged map resolves to exactly one binding
    assert(counts.nonEmpty)
  }
}
