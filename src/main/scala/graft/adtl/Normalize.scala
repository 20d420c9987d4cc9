package graft.adtl

import Spec._

/** Spec-compile-time normalization passes — the engine's "analyzer".
  * All pure tree→tree functions, run once on the driver before any Spark
  * plan is built. Mirrors the reference's pre-execution spec machinery
  * (/root/reference/src/adtl/parser.py:43-176,306-499; studied, not copied).
  */
object Normalize {

  /** Splice `ref` keys with definitions from `defs`; the referencing rule's
    * own keys override the definition's (parser.py:43-57). */
  def expandRefs(tree: Any, defs: Raw): Any = tree match {
    case m: Raw @unchecked =>
      val merged = m.get("ref") match {
        case Some(refName) =>
          val d = defs.getOrElse(refName.toString,
            throw new SpecValidationError(s"Definition not found for ref: '$refName'"))
            .asInstanceOf[Raw]
          d ++ (m - "ref")
        case None => m
      }
      merged.map { case (k, v) => k -> expandRefs(v, defs) }
    case l: List[_] => l.map(expandRefs(_, defs))
    case other => other
  }

  /** Drop `ref` keys without merging, everywhere in a tree — the shape the
    * reference's ORIGINAL header tree is left in after expand_refs (which
    * `del`s "ref" from originals but merges into new dicts), as hashed for
    * the uuid5 namespace (parser.py:49-52,358-361). */
  def stripRefKeys(tree: Any): Any = tree match {
    case m: Raw @unchecked => (m - "ref").map { case (k, v) => k -> stripRefKeys(v) }
    case l: List[_] => l.map(stripRefKeys)
    case other => other
  }

  /** Expand `for` loop entries in oneToMany blocks: the cartesian product of
    * loop variables (lists or inclusive {range=[a,b]}) instantiates one entry
    * per combination, with `{var}` substitution in keys and string values
    * (parser.py:60-125). */
  def expandFor(entries: List[Raw]): List[Raw] = entries.flatMap { entry =>
    entry.get("for") match {
      case None => List(entry)
      case Some(forExpr: Raw @unchecked) =>
        val vars: Map[String, List[Any]] = forExpr.map {
          case (v, spec: Raw @unchecked) if spec.contains("range") =>
            spec("range") match {
              case List(a: Long, b: Long) if b > a => v -> (a to b).toList.map(x => x: Any)
              case other =>
                throw new SpecValidationError(
                  s"for expression range $other must be [start, end] integers with end > start")
            }
          case (v, l: List[_]) => v -> l.asInstanceOf[List[Any]]
          case (_, other) =>
            throw new SpecValidationError(
              s"for expression $other can only have lists or ranges for variables")
        }
        val names = vars.keys.toList.sorted
        val combos = names.foldLeft(List(Map.empty[String, Any])) { (acc, n) =>
          for (m <- acc; v <- vars(n)) yield m + (n -> v)
        }
        combos.map(assign => substitute(entry - "for", assign).asInstanceOf[Raw])
      case Some(other) =>
        throw new SpecValidationError(
          s"for expression $other is not a dictionary of variables to list of values or a range")
    }
  }

  /** str.format-style `{var}` substitution over keys and string values. */
  private def substitute(tree: Any, assign: Map[String, Any]): Any = tree match {
    case m: Raw @unchecked =>
      m.map { case (k, v) => format(k, assign) -> substitute(v, assign) }
    case l: List[_] => l.map(substitute(_, assign))
    case s: String => format(s, assign)
    case other => other
  }

  private def format(s: String, assign: Map[String, Any]): String = {
    var out = s
    assign.foreach { case (k, v) => out = out.replace("{" + k + "}", v.toString) }
    out
  }

  /** Merge table-level `common` mappings into every oneToMany entry
    * (parser.py:418-420); entry keys win is NOT the reference behavior —
    * common overwrites (dict.update). */
  def mergeCommon(entries: List[Raw], common: Raw): List[Raw] =
    if (common.isEmpty) entries else entries.map(_ ++ common)

  /** Drop `optional-fields` from required/oneOf/anyOf of a JSON schema
    * (make_fields_optional, parser.py:148-176). */
  def makeFieldsOptional(schema: Raw, optional: List[String]): Raw = {
    if (optional.isEmpty) return schema
    val optSet = optional.toSet
    var out: Raw = schema.get("required") match {
      case Some(req: List[_]) =>
        schema + ("required" -> req.map(_.toString).filterNot(optSet).sorted)
      case _ => schema
    }
    for (key <- List("oneOf", "anyOf")) {
      out.get(key) match {
        case Some(options: List[_]) =>
          val opts = options.asInstanceOf[List[Raw]]
          if (opts.exists(_.contains("required"))) {
            val trimmed = opts.map { o =>
              o + ("required" -> o.getOrElse("required", Nil).asInstanceOf[List[_]]
                .map(_.toString).filterNot(optSet))
            }
            if (trimmed.forall(_.values.forall(v => v match {
              case l: List[_] => l.isEmpty
              case m: Map[_, _] => m.isEmpty
              case s: String => s.isEmpty
              case b: Boolean => !b
              case null => true
              case _ => false
            }))) out = out - key
            else {
              // de-duplicate structurally identical options
              val seen = scala.collection.mutable.LinkedHashMap[String, Raw]()
              trimmed.foreach(o => seen.getOrElseUpdate(SpecLoader.canonicalJson(o), o))
              out = out + (key -> seen.values.toList)
            }
          }
        case _ =>
      }
    }
    out
  }

  /** Date-named fields + schema format:date fields (get_date_fields,
    * parser.py:133-145). */
  def dateFields(schema: Raw): List[String] = {
    val props = schema.getOrElse("properties", Map.empty[String, Any]).asInstanceOf[Raw]
    val byName = props.keys.filter(f => f == "date" || f.contains("date_") || f.contains("_date"))
    val byFormat = props.collect {
      case (f, p: Raw @unchecked) if p.get("format").contains("date") => f
    }
    (byName ++ byFormat).toList.distinct.sorted
  }

  /** Derive the default `if` for a oneToMany entry without one: emit the row
    * iff the mapped source value is non-empty / one of the mapped keys.
    * Highest-subtlety pass; semantics per parser.py:422-499 and its tests
    * (tests/test_adtl/test_one_to_many_parser.py:245-371).
    */
  def defaultIf(table: String, schema: Option[Raw], entry: Raw): Raw = {
    if (entry.contains("if")) return entry
    // No schema (the reference crashes unhelpfully on self.schemas[table],
    // parser.py:441) and schema-without-required-fields (its ValueError,
    // parser.py:445-449) both surface the reachable reference message here.
    val oneOf = schema.map(_.getOrElse("oneOf", Nil).asInstanceOf[List[Raw]])
      .getOrElse(Nil)
    val dataOptions: List[Option[String]] = oneOf.map { option =>
      option.get("required") match {
        case Some(req: List[_]) if req.nonEmpty => Some(req.head.toString)
        case _ =>
          option.get("then") match {
            case Some(t: Raw @unchecked) =>
              t.get("required") match {
                case Some(req: List[_]) if req.nonEmpty => Some(req.head.toString)
                case _ => None
              }
            case _ => None
          }
      }
    }
    if (dataOptions.forall(_.isEmpty))
      throw new SpecValidationError(
        s"No required fields found in schema for table '$table', cannot create default 'if' rules.")

    val option = dataOptions.flatten.toSet.intersect(entry.keySet).headOption.getOrElse(
      throw new SpecValidationError(
        s"Table '$table': entry ${entry.keys.mkString(",")} matches no schema oneOf required field"))

    val optRule = entry(option) match {
      case m: Raw @unchecked => m
      case other => throw new SpecValidationError(
        s"Table '$table': cannot derive default if from constant rule $other for '$option'")
    }

    def flags(r: Raw): Raw =
      List("can_skip", "caseInsensitive").filter(r.contains).map(_ -> (true: Any)).toMap

    val ifRule: Raw =
      if (!optRule.contains("combinedType")) {
        val field = optRule("field").toString
        if (optRule.contains("values") && !optRule.get("ignoreMissingKey").contains(true)) {
          val keys = optRule("values").asInstanceOf[Raw].keys.toList
          Map("any" -> keys.map(v => Map(field -> v) ++ flags(optRule)))
        } else {
          Map(field -> Map("!=" -> "")) ++ flags(optRule)
        }
      } else {
        val ct = optRule("combinedType").toString
        if (!CombinedTypes.contains(ct))
          throw new SpecValidationError(s"Invalid combinedType: $ct")
        val subRules = optRule.getOrElse("fields", Nil).asInstanceOf[List[Raw]]
        val conds = subRules.flatMap { r =>
          val field = r("field").toString
          val values = r.get("values").map(_.asInstanceOf[Raw].keys.toList).getOrElse(Nil)
          if (values.nonEmpty && !r.get("ignoreMissingKey").contains(true))
            values.map(v => Map(field -> v) ++ flags(r))
          else List(Map(field -> Map("!=" -> "")) ++ flags(r))
        }
        Map("any" -> conds)
      }
    entry + ("if" -> ifRule)
  }
}
