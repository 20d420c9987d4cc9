package graft.adtl

/** Linear unit conversion factors for source_unit/unit rules
  * (/root/reference/src/adtl/get_value.py:200-218 uses pint). The subset of
  * units clinical line lists actually use: mass, length, volume, time. Each
  * unit maps to (dimension, factor-to-base). Conversion value_in_target =
  * value * factor(src) / factor(tgt); incompatible dimensions → error at
  * spec-compile time.
  */
object Units {

  final case class UnitDef(dimension: String, toBase: Double)

  private val defs: Map[String, UnitDef] = {
    def m(d: String, f: Double, names: String*) = names.map(_ -> UnitDef(d, f))
    (m("mass", 1e-6, "ug", "µg", "microgram", "micrograms") ++
      m("mass", 1e-3, "mg", "milligram", "milligrams") ++
      m("mass", 1.0, "g", "gram", "grams") ++
      m("mass", 1e3, "kg", "kilogram", "kilograms") ++
      m("mass", 453.59237, "lb", "lbs", "pound", "pounds") ++
      m("mass", 6350.29318, "stone", "stones", "st") ++
      m("mass", 28.349523125, "oz", "ounce", "ounces") ++
      m("length", 1e-3, "mm", "millimeter", "millimetre") ++
      m("length", 1e-2, "cm", "centimeter", "centimetre") ++
      m("length", 1.0, "m", "meter", "metre", "meters", "metres") ++
      m("length", 1e3, "km", "kilometer", "kilometre") ++
      m("length", 0.0254, "in", "inch", "inches") ++
      m("length", 0.3048, "ft", "foot", "feet") ++
      m("volume", 1e-3, "ml", "milliliter", "millilitre") ++
      m("volume", 1e-2, "cl") ++
      m("volume", 1e-1, "dl", "deciliter", "decilitre") ++
      m("volume", 1.0, "l", "liter", "litre", "liters", "litres") ++
      // time: pint's year = Julian year (365.25 d), month = year/12
      m("time", 1.0, "s", "sec", "second", "seconds") ++
      m("time", 60.0, "min", "minute", "minutes") ++
      m("time", 3600.0, "h", "hr", "hour", "hours") ++
      m("time", 86400.0, "d", "day", "days") ++
      m("time", 604800.0, "week", "weeks") ++
      m("time", 2629800.0, "month", "months") ++
      m("time", 31557600.0, "year", "years", "yr")).toMap
  }

  def lookup(unit: String): Option[UnitDef] = defs.get(unit.trim.toLowerCase)

  /** All known unit spellings (lowercase), for when-chain enumeration over a
    * dynamic source_unit column. */
  def knownUnits: List[String] = defs.keys.toList.sorted

  /** Multiplicative factor converting `from` → `to`, if both are known and
    * dimensionally compatible. */
  def factor(from: String, to: String): Option[Double] =
    for {
      f <- lookup(from)
      t <- lookup(to)
      if f.dimension == t.dimension
    } yield f.toBase / t.toBase
}
