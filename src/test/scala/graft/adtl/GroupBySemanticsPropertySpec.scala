package graft.adtl

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import scala.util.Random

/** Differential testing of cross-row groupBy semantics (group_rows,
  * parser.py:551-637): lastNotNull keeps the last non-empty parsed value in
  * file order; applyCombinedType combines across rows (min/max numeric when
  * all values numeric, any/all truthiness, set/list flatten in file order
  * with insertion-order dedup, firstNonNull). Random per-group row data is
  * evaluated by a Scala model of the reference and compared to the engine.
  */
class GroupBySemanticsPropertySpec extends SparkSpec {

  private val valuePool = Vector(
    "", "0", "1", "2", "42", "007", "7.0", "4.5", "abc", "2022-01-05",
    "2022-03-01", "male")

  private def pyAuto(s: String): Any =
    if (s.matches("[-+]?\\d+")) s.toLong
    else try s.toDouble catch { case _: NumberFormatException => s }
  private def pyRender(v: Any): String = v match {
    case null => null
    case b: Boolean => if (b) "True" else "False"
    case l: Long => l.toString
    case d: Double => if (d == math.floor(d) && !d.isInfinite) s"${d.toLong}.0" else d.toString
    case s: String => s
  }

  test("lastNotNull keeps last non-empty value per attribute in file order") {
    val rng = new Random(7L)
    val rows = (0 until 300).map { i =>
      (s"G${rng.nextInt(20)}", valuePool(rng.nextInt(valuePool.length)),
        valuePool(rng.nextInt(valuePool.length)), i.toLong)
    }
    // model: per group, last value with v != ""
    def lastNonEmpty(vs: Seq[String]): String =
      vs.filter(_.nonEmpty).lastOption.orNull
    val expect = rows.groupBy(_._1).map { case (g, rs) =>
      g -> (lastNonEmpty(rs.map(_._2)), lastNonEmpty(rs.map(_._3)))
    }

    val spec =
      """{"adtl": {"name": "s", "description": "d", "tables": {
          "t": {"kind": "groupBy", "groupBy": "gid", "aggregation": "lastNotNull"}}},
          "t": {"gid": {"field": "g"}, "a": {"field": "a"}, "b": {"field": "b"}}}"""
    val schema = StructType(Seq("g", "a", "b", "seq").map(c => StructField(c, StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(r => Row(r._1, r._2, r._3, r._4.toString)), 4), schema)
    // output order: groupField first, then attrs (gid, a, b)
    val out = AdtlParser.fromJsonString(spec)
      .parseDataFrame(spark, df, orderCol = Some("seq"))("t")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    expect.foreach { case (g, (wa, wb)) =>
      assert(out(g) == (wa, wb), s"group $g")
    }
  }

  test("applyCombinedType cross-row modes match the reference model") {
    val rng = new Random(99L)
    val rows = (0 until 240).map { i =>
      (s"G${rng.nextInt(12)}",
        valuePool(rng.nextInt(valuePool.length)), // minmax source
        Vector("", "0", "1")(rng.nextInt(3)), // bool-ish source
        valuePool(rng.nextInt(valuePool.length)), // list source
        i.toLong)
    }
    val spec =
      """{"adtl": {"name": "s", "description": "d", "tables": {
          "t": {"kind": "groupBy", "groupBy": "gid", "aggregation": "applyCombinedType"}}},
          "t": {"gid": {"field": "g"},
            "mn": {"combinedType": "min", "fields": [{"field": "m"}]},
            "mx": {"combinedType": "max", "fields": [{"field": "m"}]},
            "anyb": {"combinedType": "any", "fields": [{"field": "b", "values": {"1": true, "0": false}}]},
            "allb": {"combinedType": "all", "fields": [{"field": "b", "values": {"1": true, "0": false}}]},
            "fst": {"combinedType": "firstNonNull", "fields": [{"field": "l"}]},
            "lst": {"combinedType": "list", "excludeWhen": "none", "fields": [{"field": "l"}]},
            "st": {"combinedType": "set", "excludeWhen": "none", "fields": [{"field": "l"}]}}}"""

    // ---- model of group_rows over per-row parsed values ----
    def modelGroup(rs: Seq[(String, String, String, String, Long)]) = {
      // per-row parse: min/max sub renders canonically per compileCombined;
      // firstNonNull yields the raw value; list/set per-row is a 1-elem
      // (or empty) auto-cast list
      val mnRow = rs.map(_._2).map(v => if (v.isEmpty) null else pyAuto(v))
      val bRow = rs.map(_._3).map {
        case "" => null
        case "1" => java.lang.Boolean.TRUE
        case "0" => java.lang.Boolean.FALSE
      }
      // excludeWhen "none" filters the null per-row, leaving [] which is
      // stripped from the parsed row entirely
      val lRow: Seq[List[Any]] = rs.map(_._4).map(v =>
        if (v.isEmpty) List() else List(pyAuto(v)))
      val rawL = rs.map(_._4).map(v => if (v.isEmpty) null else pyAuto(v))
      // group combine (values exclude None/""; rows whose value was
      // null-stripped don't contribute)
      def present[A](xs: Seq[A]): Seq[A] = xs.filter(x => x != null && x != "")
      val mnVals = present(mnRow)
      val (mn, mx) =
        if (mnVals.isEmpty) (null, null)
        else {
          val allNum = mnVals.forall(v => v.isInstanceOf[Long] || v.isInstanceOf[Double])
          if (allNum) {
            val d = mnVals.map { case l: Long => l.toDouble; case x: Double => x }
            (mnVals(d.indexOf(d.min)), mnVals(d.indexOf(d.max)))
          } else if (mnVals.forall(_.isInstanceOf[String])) {
            val s = mnVals.map(_.asInstanceOf[String])
            (s.min, s.max)
          } else ("SKIP", "SKIP")
        }
      val bVals = present(bRow).map(_.asInstanceOf[Boolean])
      val anyb = if (bVals.isEmpty) null else java.lang.Boolean.valueOf(bVals.exists(identity))
      val allb = if (bVals.isEmpty) null else java.lang.Boolean.valueOf(bVals.forall(identity))
      // list-valued attrs: per-row empty lists are stripped ([] not in data);
      // rows with List(null) are kept (non-empty list)
      val lValid = lRow.filter(l => l.nonEmpty)
      val fst = present(rawL).headOption.orNull
      val lst = lValid.flatten
      val st = lst.distinct
      (mn, mx, anyb, allb, fst, lst, st)
    }

    val schema = StructType(Seq("g", "m", "b", "l", "seq").map(c => StructField(c, StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(r => Row(r._1, r._2, r._3, r._4, r._5.toString)), 4), schema)
    val out = AdtlParser.fromJsonString(spec)
      .parseDataFrame(spark, df, orderCol = Some("seq"))("t")
      .collect().map { r =>
        val m = r.getValuesMap[Any](Seq("gid", "mn", "mx", "anyb", "allb", "fst", "lst", "st"))
        m("gid").asInstanceOf[String] -> m
      }.toMap

    var failures = List.empty[String]
    rows.groupBy(_._1).foreach { case (g, rs0) =>
      val rs = rs0.sortBy(_._5)
      val (mn, mx, anyb, allb, fst, lst, st) = modelGroup(rs)
      val got = out(g)
      def gs(k: String): String = Option(got(k)).map(_.toString).orNull
      def gl(k: String): List[String] = Option(got(k))
        .map(_.asInstanceOf[scala.collection.Seq[String]].toList).getOrElse(null)
      if (mn != "SKIP") {
        if (gs("mn") != pyRender(mn)) failures ::= s"$g mn: ${gs("mn")} vs ${pyRender(mn)}"
        if (gs("mx") != pyRender(mx)) failures ::= s"$g mx: ${gs("mx")} vs ${pyRender(mx)}"
      }
      val wantAny = Option(anyb).map(b => b.toString.capitalize).orNull
      val wantAll = Option(allb).map(b => b.toString.capitalize).orNull
      val gotAny = Option(got("anyb")).map(_.toString.capitalize).orNull
      val gotAll = Option(got("allb")).map(_.toString.capitalize).orNull
      if (gotAny != wantAny) failures ::= s"$g any: $gotAny vs $wantAny"
      if (gotAll != wantAll) failures ::= s"$g all: $gotAll vs $wantAll"
      if (gs("fst") != pyRender(fst)) failures ::= s"$g fst: ${gs("fst")} vs ${pyRender(fst)}"
      val wantLst = lst.map(pyRender)
      val wantSt = st.map(pyRender)
      if (gl("lst") != wantLst) failures ::= s"$g lst: ${gl("lst")} vs $wantLst"
      if (gl("st") != wantSt) failures ::= s"$g st: ${gl("st")} vs $wantSt"
    }
    assert(failures.isEmpty,
      s"${failures.length} failures, first 3: ${failures.take(3).mkString(" | ")}")
  }
}
