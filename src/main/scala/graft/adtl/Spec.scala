package graft.adtl

/** Typed views over the raw spec tree plus spec-level validation with
  * reference-parity error messages.
  * Models /root/reference/src/adtl/adtl_pydantic.py:179-281 (studied, not copied).
  */
object Spec {

  final class SpecValidationError(msg: String) extends RuntimeException(msg)

  type Raw = Map[String, Any]

  val TableKinds = Set("constant", "oneToOne", "groupBy", "oneToMany")
  val Aggregations = Set("lastNotNull", "applyCombinedType")
  val CombinedTypes = Set("list", "any", "all", "firstNonNull", "set", "min", "max")

  final case class TableMeta(
      name: String,
      kind: String,
      groupBy: Option[String],
      aggregation: Option[String],
      schemaPath: Option[String],
      optionalFields: List[String],
      common: Raw,
      discriminator: Option[String])

  final case class Header(raw: Raw) {
    def name: String = raw.get("name").map(_.toString).getOrElse(
      throw new SpecValidationError("adtl.name\n  Field required"))
    def description: String = raw.get("description").map(_.toString).getOrElse(
      throw new SpecValidationError("adtl.description\n  Field required"))
    def defs: Raw = raw.getOrElse("defs", Map.empty[String, Any]).asInstanceOf[Raw]
    def includeDefs: List[String] =
      raw.getOrElse("include-def", Nil) match {
        case l: List[_] => l.map(_.toString)
        case s: String => List(s)
        case _ => Nil
      }
    def defaultDateFormat: String =
      raw.getOrElse("defaultDateFormat", "%Y-%m-%d").toString
    def skipFieldPattern: Option[String] = raw.get("skipFieldPattern").map(_.toString)
    def returnUnmatched: Boolean =
      raw.get("returnUnmatched").exists(_ == true)
    def emptyFields: Option[String] = raw.get("emptyFields").map(_.toString)

    def tables: Map[String, TableMeta] = {
      val t = raw.get("tables") match {
        case Some(m: Raw @unchecked) => m
        case _ => throw new SpecValidationError("Specification header requires 'tables'")
      }
      t.map { case (tname, meta0) =>
        val meta = meta0 match {
          case m: Raw @unchecked => m
          case _ => throw new SpecValidationError(s"Table '$tname' metadata must be a mapping")
        }
        // error-message parity with the reference's pydantic models
        // (adtl_pydantic.py:178-200; tests/test_adtl/test_spec_refs_and_defs.py:114-212)
        val kind = meta.get("kind").map(_.toString).getOrElse(
          throw new SpecValidationError(s"adtl.tables.$tname.kind\n  Field required"))
        if (!TableKinds.contains(kind))
          throw new SpecValidationError(
            s"adtl.tables.$tname.kind\n  Input should be 'constant', 'groupBy', 'oneToMany' or 'oneToOne' (invalid kind '$kind')")
        val groupBy = meta.get("groupBy").map(_.toString)
        val aggregation = meta.get("aggregation").map(_.toString)
        aggregation.foreach { a =>
          if (!Aggregations.contains(a))
            throw new SpecValidationError(
              s"adtl.tables.$tname.aggregation\n  Input should be 'lastNotNull' or 'applyCombinedType'")
        }
        if (kind == "groupBy") {
          if (groupBy.isEmpty)
            throw new SpecValidationError("groupBy key is required for 'groupBy' tables")
          if (aggregation.isEmpty)
            throw new SpecValidationError("aggregation is required for 'groupBy' tables")
        }
        if (kind == "oneToMany" && meta.get("discriminator").isEmpty)
          throw new SpecValidationError(
            "'discriminator' is required for 'oneToMany' tables")
        tname -> TableMeta(
          name = tname,
          kind = kind,
          groupBy = groupBy,
          aggregation = aggregation,
          schemaPath = meta.get("schema").map(_.toString),
          optionalFields = meta.getOrElse("optional-fields", Nil) match {
            case l: List[_] => l.map(_.toString)
            case _ => Nil
          },
          common = meta.getOrElse("common", Map.empty[String, Any]).asInstanceOf[Raw],
          discriminator = meta.get("discriminator").map(_.toString))
      }
    }
  }

  /** A fully loaded + normalized spec: header metadata, per-table rule
    * blocks (Map for constant/oneToOne/groupBy; List of match entries for
    * oneToMany), and loaded JSON schemas.
    */
  final case class AdtlSpec(
      header: Header,
      tables: Map[String, TableMeta],
      tableRules: Map[String, Any],
      schemas: Map[String, Raw],
      dateFields: List[String],
      nsHeader: Raw = Map.empty) {

    /** uuid5 namespace is derived from the reference's exact hashed header
      * form (pre-expansion, refs dropped, include-defs merged when the
      * header declares defs) — see AdtlParser's nsHeader construction. */
    def namespaceUuid: java.util.UUID =
      Uuid5.namespaceFromHeader(if (nsHeader.nonEmpty) nsHeader else header.raw)

    /** Deterministic output column order: sorted attr names (constant/
      * oneToOne/groupBy), or schema properties / common+entry union for
      * oneToMany. Mirrors _set_field_names (parser.py:401-417).
      */
    def fieldNames(table: String): List[String] = {
      val meta = tables(table)
      if (meta.kind != "oneToMany") {
        tableRules(table).asInstanceOf[Raw].keys.toList.sorted
      } else schemas.get(table) match {
        case Some(schema) =>
          schema.getOrElse("properties", Map.empty[String, Any])
            .asInstanceOf[Raw].keys.toList.sorted
        case None =>
          val entries = tableRules(table).asInstanceOf[List[Raw]]
          meta.common.keys.toList :::
            entries.flatMap(_.keys).distinct.filterNot(k => k == "if" || meta.common.contains(k)).sorted
      }
    }
  }

  /** Recursively harvest every `field` reference (get_spec_fields,
    * parser.py:885-913) for `check`-style spec/data diffs. */
  def specFields(tree: Any): Set[String] = tree match {
    case m: Raw @unchecked =>
      m.flatMap {
        case ("field", v: String) => Set(v) ++ specFields(m - "field")
        case (_, v) => specFields(v)
      }.toSet
    case l: List[_] => l.flatMap(specFields).toSet
    case _ => Set.empty
  }
}
