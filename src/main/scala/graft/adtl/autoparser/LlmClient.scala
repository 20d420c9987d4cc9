package graft.adtl.autoparser

/** Response shapes for the autoparser's LLM stages (G2/G4), mirroring the
  * reference's pydantic models
  * (/root/reference/src/adtl/autoparser/language_models/data_structures.py;
  * studied, not copied). */
object Llm {

  /** ColumnDescriptionRequest.SingleField: a source header plus its
    * English translation/description. */
  final case class SingleField(fieldName: String, translation: Option[String])

  /** MappingRequest.SingleMapping: a target schema field matched to the
    * description of a source field (None = LLM found no match). */
  final case class SingleMapping(
      targetField: String, sourceDescription: Option[String])

  /** ValuesRequest.FieldMapping: per-field source-value → target-value
    * options (None target = drop the value). Pair order is the LLM's
    * response order and is preserved end-to-end. */
  final case class FieldValues(
      fieldName: String, mappedValues: List[(String, Option[String])])

  /** Long-table SingleEntry: one source field mapped to a variable name
    * from the schema's discriminator enum plus the value column that
    * carries it; `otherFields` holds the remaining schema attributes the
    * model filled (e.g. vet_name). */
  final case class LongEntry(
      sourceDescription: String,
      variableName: Option[String],
      valueCol: Option[String],
      otherFields: Map[String, String] = Map.empty)
}

/** Pluggable LLM interface for the autoparser's generation stages —
  * the reference's LLMBase contract
  * (/root/reference/src/adtl/autoparser/language_models/base_llm.py:6-39).
  * Network-backed providers are out of engine scope (zero egress);
  * [[CannedLlmClient]] is the deterministic implementation the reference's
  * own test suite uses for its LLM seams
  * (tests/test_autoparser/testing_data_animals.py TestLLM). */
trait LlmClient {

  /** dict_writer.py generate_descriptions seam: translate/describe the
    * given source-data column headers. */
  def getDefinitions(headers: List[String], language: String): List[Llm.SingleField]

  /** wide_mapper.py match_fields_to_schema seam: propose a source
    * description for each target schema field. */
  def mapFields(sourceDescriptions: List[String],
      targetFields: List[String]): List[Llm.SingleMapping]

  /** base_mapper.py match_values_to_schema seam: for each (field,
    * source values, target options) tuple, map source values onto the
    * target enum/boolean options. */
  def mapValues(values: List[(String, List[String], List[String])],
      language: String): List[Llm.FieldValues]

  /** long_mapper.py match_fields_to_schema seam: map each source
    * description to a discriminator value + value column (+ any other
    * schema attributes). */
  def mapLongTable(sourceDescriptions: List[String],
      variableEnum: List[String], valueCols: List[String],
      otherFields: List[String]): List[Llm.LongEntry]
}

/** Deterministic canned-response client: responses come from constructor
  * data, never a network call — the reference's TestLLM pattern
  * (tests/test_autoparser/testing_data_animals.py), promoted to a library
  * class so the full autoparser pipeline runs offline and reproducibly
  * (a caller with API access can supply a real provider behind the same
  * trait). Like TestLLM, the canned responses are returned wholesale —
  * the request arguments select nothing. */
final class CannedLlmClient(
    definitions: List[(String, String)] = Nil,
    fieldMappings: List[(String, Option[String])] = Nil,
    valueMappings: List[(String, List[(String, Option[String])])] = Nil,
    longEntries: List[Llm.LongEntry] = Nil) extends LlmClient {

  def getDefinitions(headers: List[String], language: String): List[Llm.SingleField] =
    definitions.map { case (k, v) => Llm.SingleField(k, Some(v)) }

  def mapFields(sourceDescriptions: List[String],
      targetFields: List[String]): List[Llm.SingleMapping] =
    fieldMappings.map { case (t, d) => Llm.SingleMapping(t, d) }

  def mapValues(values: List[(String, List[String], List[String])],
      language: String): List[Llm.FieldValues] =
    valueMappings.map { case (f, vs) => Llm.FieldValues(f, vs) }

  def mapLongTable(sourceDescriptions: List[String],
      variableEnum: List[String], valueCols: List[String],
      otherFields: List[String]): List[Llm.LongEntry] = longEntries
}

/** Port of difflib's SequenceMatcher ratio + get_close_matches — the
  * fuzzy repair the autoparser applies when an LLM echoes a field name or
  * description with small distortions
  * (/root/reference/src/adtl/autoparser/util.py:104-125 check_matches;
  * difflib is Python stdlib, algorithm public). No junk heuristic: the
  * autojunk cutoff only engages at ≥200-char sequences, far beyond any
  * header or description compared here. */
object Fuzzy {

  /** difflib SequenceMatcher.ratio(): 2·M/T where M totals the matching
    * blocks found by recursive longest-contiguous-match (earliest match
    * preferred on ties, exactly difflib's scan order). */
  def ratio(a: String, b: String): Double = {
    if (a.length + b.length == 0) return 1.0
    val b2j = scala.collection.mutable.Map.empty[Char, List[Int]]
    for (j <- b.length - 1 to 0 by -1)
      b2j(b(j)) = j :: b2j.getOrElse(b(j), Nil)

    def findLongest(alo: Int, ahi: Int, blo: Int, bhi: Int): (Int, Int, Int) = {
      var besti = alo; var bestj = blo; var bestsize = 0
      var j2len = Map.empty[Int, Int]
      var i = alo
      while (i < ahi) {
        var newj2len = Map.empty[Int, Int]
        var js = b2j.getOrElse(a(i), Nil)
        while (js.nonEmpty && js.head < bhi) {
          val j = js.head
          if (j >= blo) {
            val k = j2len.getOrElse(j - 1, 0) + 1
            newj2len += j -> k
            if (k > bestsize) { besti = i - k + 1; bestj = j - k + 1; bestsize = k }
          }
          js = js.tail
        }
        j2len = newj2len
        i += 1
      }
      (besti, bestj, bestsize)
    }

    var matches = 0
    val queue = scala.collection.mutable.Stack((0, a.length, 0, b.length))
    while (queue.nonEmpty) {
      val (alo, ahi, blo, bhi) = queue.pop()
      val (i, j, k) = findLongest(alo, ahi, blo, bhi)
      if (k > 0) {
        matches += k
        if (alo < i && blo < j) queue.push((alo, i, blo, j))
        if (i + k < ahi && j + k < bhi) queue.push((i + k, ahi, j + k, bhi))
      }
    }
    2.0 * matches / (a.length + b.length)
  }

  /** util.py:104-125 check_matches: the single closest candidate at or
    * above `cutoff`, None when nothing qualifies. Ties follow
    * get_close_matches (heapq.nlargest over (ratio, string) tuples:
    * equal ratios resolve to the lexicographically larger string). */
  def checkMatches(llm: String, source: List[String],
      cutoff: Double = 0.8): Option[String] = {
    val qualified = source.map(s => (ratio(llm, s), s)).filter(_._1 >= cutoff)
    if (qualified.isEmpty) None
    else Some(qualified.max(Ordering.Tuple2(Ordering.Double.TotalOrdering,
      Ordering.String))._2)
  }
}
