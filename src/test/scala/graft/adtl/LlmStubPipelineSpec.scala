package graft.adtl

import graft.SparkSpec
import graft.adtl.autoparser._
import graft.adtl.autoparser.DictReader.DictEntry
import graft.adtl.autoparser.MappingParser.LongTableConfig
import scala.collection.immutable.VectorMap

/** G2/G4 through the pluggable LLM seam: the full autoparser pipeline —
  * description generation, wide and long intermediate mappings, spec
  * generation — runs offline through [[CannedLlmClient]], mirroring the
  * reference's own mocked-LLM suite (tests/test_autoparser/
  * testing_data_animals.py TestLLM + test_dict_writer.py /
  * test_mapper.py / test_long_mapper.py expectations; canned fixture data
  * reproduced from there). Fuzzy repair is pinned against difflib. */
class LlmStubPipelineSpec extends SparkSpec {

  private val res = "src/test/resources/golden/autoparser"

  private val dictColumnMappings = Map(
    "source_field" -> "Field Name", "source_description" -> "Description",
    "source_type" -> "Field Type", "common_values" -> "Common Values")

  // the reference's canned LLM fixtures (testing_data_animals.py)
  private val cannedDescriptions = List(
    "Identité" -> "Identity", "Province" -> "Province",
    "DateNotification" -> "Notification Date",
    "Classicfication " -> "Classification", "Nom complet " -> "Full Name",
    "Date de naissance" -> "Date of Birth", "AgeAns" -> "Age in Years",
    "AgeMois         " -> "Age in Months", "Sexe" -> "Gender",
    "StatusCas" -> "Case Status", "DateDec" -> "Date of Death",
    "ContSoins " -> "Care Contact", "ContHumain Autre" -> "Other Human Contact",
    "ContexteContHumain" -> "Human Contact Context",
    "ContactAnimal" -> "Animal Contact", "Micropucé" -> "Microchipped",
    "AnimalDeCompagnie" -> "Pet Animal",
    "ConditionsPreexistantes" -> "Preexisting Conditions")

  private val cannedFieldMappings: List[(String, Option[String])] = List(
    "identity" -> Some("Identity"), "name" -> Some("Full Name"),
    "loc_admin_1" -> Some("Province"), "country_iso3" -> None,
    "notification_date" -> Some("Notification Date"),
    "classification" -> Some("Classification"),
    "case_status" -> Some("Case Status"),
    "date_of_death" -> Some("Death Date"), // misspelled by the 'LLM'
    "age_years" -> Some("Age Years"), // misspelled by the 'LLM'
    "age_months" -> Some("Age in Months"), "sex" -> Some("Gender"),
    "pet" -> Some("Pet Animal"), "chipped" -> Some("Microchipped"),
    "owner" -> None, "underlying_conditions" -> Some("Preexisting Conditions"))

  private val cannedValueMappings = List(
    "classification" -> List("mammifère" -> Some("mammal"),
      "fish" -> Some("fish"), "poisson" -> Some("fish"),
      "amphibie" -> Some("amphibian"), "oiseau" -> Some("bird"),
      "autre" -> None, "rept" -> Some("reptile")),
    "case_status" -> List("vivant" -> Some("alive"), "décédé" -> Some("dead")),
    "sex" -> List("m" -> Some("male"), "f" -> Some("female"),
      "inconnu" -> None),
    "pet" -> List("oui" -> Some("True"), "non" -> Some("False")),
    "chipped" -> List("oui" -> Some("True"), "non" -> Some("False")))

  private def wideLlm = new CannedLlmClient(
    definitions = cannedDescriptions,
    fieldMappings = cannedFieldMappings,
    valueMappings = cannedValueMappings)

  private lazy val animalsSchema =
    SpecLoader.loadFile(s"$res/animals.schema.json")

  test("Fuzzy.ratio is bit-identical to difflib.SequenceMatcher.ratio") {
    // pinned with: python3 -c "difflib.SequenceMatcher(None, a, b).ratio()"
    val pins = List(
      ("Death Date", "Date of Death", 0.4347826087),
      ("Death Date", "Date of Birth", 0.347826087),
      ("Age Years", "Age in Years", 0.8571428571),
      ("abc", "abd", 0.6666666667),
      ("", "x", 0.0),
      ("same", "same", 1.0),
      ("kitten", "sitting", 0.6153846154),
      ("Notification Date", "DateNotification", 0.7272727273))
    pins.foreach { case (a, b, want) =>
      assert(math.abs(Fuzzy.ratio(a, b) - want) < 1e-9, s"ratio($a, $b)")
    }
    val descs = cannedDescriptions.map(_._2)
    assert(Fuzzy.checkMatches("Death Date", descs).isEmpty)
    assert(Fuzzy.checkMatches("Age Years", descs) == Some("Age in Years"))
  }

  test("generateDescriptions reproduces the reference's described dictionary " +
      "byte-for-byte") {
    val raw = Mapper.loadRawDict(spark, s"$res/animals_dd.csv",
      dictColumnMappings)
    assert(raw.length == 18)
    assert(raw.forall(_.sourceDescription.isEmpty))
    val described = Mapper.generateDescriptions(raw, wideLlm, "fr")
    val got = Mapper.renderDictCsv(described, dictColumnMappings)
    val want = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$res/animals_dd_described.csv")), "UTF-8")
    assert(got == want.replace("\r\n", "\n"))
  }

  test("generateDescriptions rejects LLM responses whose field names drift") {
    val raw = Mapper.loadRawDict(spark, s"$res/animals_dd.csv",
      dictColumnMappings)
    val drifted = new CannedLlmClient(
      definitions = cannedDescriptions.map { case (k, v) =>
        ("completely different " + k.hashCode) -> v })
    val e = intercept[IllegalArgumentException] {
      Mapper.generateDescriptions(raw, drifted, "fr")
    }
    assert(e.getMessage.contains(
      "Field names from the LLM don't match the originals."))
  }

  private lazy val describedDict: List[DictEntry] =
    DictReader.validateDictionaryFile(spark, s"$res/animals_dd_described.csv",
      dictColumnMappings)

  test("wide field matching: merge, fuzzy repair, reindex to schema order") {
    val matched = Mapper.matchFieldsToSchema(describedDict, animalsSchema, wideLlm)
    assert(matched.map(_._1) == List("identity", "name", "loc_admin_1",
      "country_iso3", "notification_date", "classification", "case_status",
      "date_of_death", "age_years", "age_months", "sex", "pet", "chipped",
      "owner", "underlying_conditions"))
    val byTarget = matched.map(r => r._1 -> r).toMap
    // the misspelled description 'Age Years' is repaired to 'Age in Years'
    assert(byTarget("age_years")._3.map(_.sourceField) == Some("AgeAns"))
    // 'Death Date' is beyond the 0.8 difflib cutoff — stays unmapped
    assert(byTarget("date_of_death")._3.isEmpty)
    val cs = byTarget("case_status")._3.get
    assert(cs.sourceField == "StatusCas")
    assert(cs.commonValues == Some(List("vivant", "décédé")))
  }

  test("wide create_mapping matches the reference's mocked expectations") {
    val rows = Mapper.createWideMapping(describedDict, animalsSchema,
      wideLlm, "fr")
    assert(rows.length == 15)
    val byTarget = rows.map(r => r.targetField -> r).toMap
    val pet = byTarget("pet")
    assert(pet.sourceDescription == Some("Pet Animal"))
    assert(pet.sourceField == Some("AnimalDeCompagnie"))
    assert(pet.commonValues.map(Mapper.renderValues) == Some("oui | non"))
    assert(pet.targetValues.map(Mapper.renderValues) ==
      Some("True | False | None"))
    assert(pet.valueMapping.map(Mapper.renderValueMapping) ==
      Some("oui=True | non=False"))
    assert(byTarget("case_status").targetValues.map(Mapper.renderValues) ==
      Some("alive | dead | unknown | None"))
    assert(byTarget("sex").valueMapping.map(Mapper.renderValueMapping) ==
      Some("m=male | f=female | inconnu=None"))
    assert(byTarget("classification").valueMapping
      .map(Mapper.renderValueMapping) == Some("mammifère=mammal | fish=fish" +
      " | poisson=fish | amphibie=amphibian | oiseau=bird | autre=None" +
      " | rept=reptile"))
    // unmapped schema fields come back with every column empty
    assert(byTarget("owner").sourceField.isEmpty)
    assert(byTarget("country_iso3").sourceField.isEmpty)
    // array target: enum comes from items
    assert(byTarget("underlying_conditions").targetValues == Some(List(
      "diabetes", "arthritis", "seizures", "vomiting", "skin problems")))
    // CSV render round-trips through the deterministic mapping reader
    val csv = Mapper.renderWideCsv(rows)
    val tmp = java.nio.file.Files.createTempFile("graftmap", ".csv")
    java.nio.file.Files.write(tmp, csv.getBytes("UTF-8"))
    val reread = MappingParser.rowsFromCsv(spark, tmp.toString)
    assert(reread.map(_.targetField) == rows.map(_.targetField))
    assert(reread.map(_.valueMapping) ==
      rows.map(_.valueMapping.map(Mapper.renderValueMapping)))
  }

  test("coded choices are relabeled through the LLM's value mapping") {
    val dict = DictReader.validateDictionaryFile(spark,
      s"$res/animals_dd_choices.csv", Map(
        "source_field" -> "Field Name", "source_description" -> "Description",
        "source_type" -> "Field Type", "choices" -> "Choices"))
    val rows = Mapper.createWideMapping(dict, animalsSchema, wideLlm, "fr")
    val classification = rows.find(_.targetField == "classification").get
    assert(classification.valueMapping.map(Mapper.renderValueMapping) ==
      Some("1=fish | 2=amphibian | 3=bird | 4=mammal | 5=fish | 6=reptile"))
  }

  test("wide mapping feeds the deterministic spec generator end-to-end") {
    val rows = Mapper.createWideMapping(describedDict, animalsSchema,
      wideLlm, "fr")
    val (table, defs) = MappingParser.wideTable(
      Mapper.toMappingRows(rows), animalsSchema)
    // the repeated boolean map (pet + chipped) is hoisted into Y/N/NK
    assert(defs.contains("Y/N/NK"))
    assert(table("pet").asInstanceOf[Spec.Raw]("ref") == "Y/N/NK")
    assert(table("chipped").asInstanceOf[Spec.Raw]("ref") == "Y/N/NK")
    // required-but-unmapped schema field becomes an empty constant
    assert(table("country_iso3") == "")
    // inline values map (sex repeats nowhere → no ref), caseInsensitive
    val sexRule = table("sex").asInstanceOf[Spec.Raw]
    assert(sexRule("field") == "Sexe")
    assert(sexRule("caseInsensitive") == true)
    assert(sexRule("values") == Map("m" -> "male", "f" -> "female",
      "inconnu" -> ""))
    // no choices came back for the array field → plain field rule, no
    // enum_list (the reference only adds it alongside a values map)
    assert(!table("underlying_conditions").asInstanceOf[Spec.Raw]
      .contains("type"))
    // the whole thing renders to TOML without error
    val toml = SpecGenerator.toToml(VectorMap("animals" -> table) ++
      (if (defs.asInstanceOf[Map[String, Any]].nonEmpty)
        VectorMap("animals.defs" -> defs) else VectorMap.empty))
    assert(toml.contains("field = \"AgeAns\""))
  }

  // ---- long mapping ------------------------------------------------------

  private val longDict: List[DictEntry] = List(
    ("ID", "Identity number", "numeric", None),
    ("name", "Name of animal", "string", None),
    ("owner", "Name of Owner", "string", None),
    ("date", "Date of visit", "date", None),
    ("clinic_name", "Clinic or location", "string", Some("ST, J, C, B")),
    ("weight_kg", "Weight in kg", "numeric", None),
    ("temperature_C", "Temperature in Celsius", "numeric", None),
    ("vacc_status", "Vaccination Status", "boolean",
      Some("True, False, None")),
    ("reported_issues", "Reported issues", "string", None)
  ).map { case (f, d, t, cv) =>
    DictEntry(f, Some(t), Some(d),
      cv.map(_.split(",").map(_.toLowerCase.trim).toList), None)
  }

  private val cannedLongEntries = List(
    Llm.LongEntry("Weight in kg", Some("weight"), Some("numeric_value"),
      Map("vet_name" -> "Dr. Lopez")),
    Llm.LongEntry("Vaccination Status", Some("vaccinated"),
      Some("boolean_value"), Map("vet_name" -> "Dr. Lopez")),
    Llm.LongEntry("Reported issues", Some("behavioural_issue"),
      Some("string_value"), Map("vet_name" -> "Dr. Lopez")),
    Llm.LongEntry("Temperature in Celsius", Some("temperature"),
      Some("numeric_value"), Map("vet_name" -> "Dr. Kamau")))

  private def longLlm = new CannedLlmClient(
    longEntries = cannedLongEntries,
    valueMappings = List("vacc_status" ->
      List("true" -> Some("True"), "false" -> Some("False"))))

  private lazy val vetSchema = SpecLoader.loadFile(s"$res/vet-obs.schema.json")
  private val longCfg = LongTableConfig(List("animal_id", "visit_date"),
    "observation", List("string_value", "boolean_value", "numeric_value"))

  test("long mapping matches the reference's mocked expectations") {
    val rows = Mapper.createLongMapping(longDict, vetSchema, longCfg,
      List("animal_id" -> "subjid", "visit_date" -> "Yesterday"),
      longLlm, "fr")
    assert(rows.length == 9) // one per source field, unmapped included
    val bySource = rows.map(r => r("source_field") -> r).toMap
    val w = bySource("weight_kg")
    assert(w("observation") == "weight")
    assert(w("value_col") == "numeric_value")
    assert(w("vet_name") == "Dr. Lopez")
    assert(w("animal_id") == "subjid")
    assert(w("visit_date") == "Yesterday")
    assert(bySource("vacc_status")("value_mapping") == "true=True | false=False")
    // unmapped fields carry no discriminator
    List("ID", "name", "owner", "date", "clinic_name").foreach(f =>
      assert(!bySource(f).contains("observation"), f))
  }

  test("long mapping config errors match the reference's messages") {
    val e1 = intercept[IllegalArgumentException] {
      Mapper.createLongMapping(longDict, vetSchema, longCfg,
        List("wrong_field" -> "DRC"), longLlm, "fr")
    }
    assert(e1.getMessage.contains("do not match provided common fields"))
    val noEnum = vetSchema + ("properties" ->
      (vetSchema("properties").asInstanceOf[Spec.Raw] + ("observation" ->
        VectorMap("type" -> "string"))))
    val e2 = intercept[IllegalArgumentException] {
      Mapper.createLongMapping(longDict, noEnum, longCfg,
        List("animal_id" -> "subjid", "visit_date" -> "Yesterday"),
        longLlm, "fr")
    }
    assert(e2.getMessage.contains("does not have an enum set"))
  }

  test("long mapping feeds the deterministic long-table generator end-to-end") {
    val rows = Mapper.createLongMapping(longDict, vetSchema, longCfg,
      List("animal_id" -> "subjid", "visit_date" -> "date"), longLlm, "fr")
    val mapped = rows.filter(_.contains("observation")).map(_.toMap)
    assert(mapped.length == 4)
    val entries = MappingParser.longTable(mapped, vetSchema, longCfg)
    val weight = entries.find(_("observation") == "weight").get
    assert(weight("numeric_value") == Map("field" -> "weight_kg"))
    assert(weight("animal_id") == Map("field" -> "subjid"))
    assert(weight("vet_name") == "Dr. Lopez") // other field → constant
    val vacc = entries.find(_("observation") == "vaccinated").get
    val rule = vacc("boolean_value").asInstanceOf[Spec.Raw]
    assert(rule("field") == "vacc_status")
    assert(rule("values") == Map("true" -> true, "false" -> false))
  }
}
