package graft.sources

import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable.{ArrayBuffer, ListBuffer}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Minimal XLSX reader built only on the JDK (java.util.zip + StAX) — no
  * external spreadsheet library. Mirrors what the reference gets from
  * `pd.read_excel` for its autoparser inputs
  * (/root/reference/src/adtl/autoparser/util.py:35-36; studied, not
  * copied): first worksheet, first row as the header, every cell
  * surfaced as a string column.
  *
  * Scale note: an .xlsx file is a single ZIP — inherently
  * non-splittable, so it is parsed on the driver and parallelized.
  * That is the right call: spreadsheets are config-sized inputs
  * (data dictionaries, mapping tables); bulk data arrives as
  * parquet/CSV which scan distributed.
  *
  * Supported cell forms: shared strings (`t="s"`, incl. rich-text runs,
  * phonetic runs excluded), inline strings (`t="inlineStr"`), cached
  * formula strings (`t="str"`), booleans (`t="b"` → "True"/"False" as
  * Python's str(bool) renders them), and raw numeric text. Date cells
  * surface as Excel serial numbers (style tables are not interpreted).
  */
object XlsxReader {

  def read(spark: SparkSession, path: String): DataFrame = {
    val rows = readRows(path)
    if (rows.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], StructType(Nil))
    val header = mangleHeader(rows.head)
    val width = header.length
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    val data = rows.tail.map { r =>
      Row.fromSeq(r.padTo(width, null).take(width).toSeq)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toSeq, 1), schema)
  }

  /** Header names the way pd.read_excel surfaces them: empty/absent cells
    * become "Unnamed: <colIdx>" and repeats get ".1", ".2", … suffixes —
    * so name-based row access downstream is never ambiguous. */
  private[sources] def mangleHeader(raw: Array[String]): Array[String] = {
    val counts = scala.collection.mutable.Map.empty[String, Int]
    raw.zipWithIndex.map { case (cell, i) =>
      val base = Option(cell).map(_.trim).filter(_.nonEmpty)
        .getOrElse(s"Unnamed: $i")
      counts.get(base) match {
        case None => counts(base) = 0; base
        case Some(n) =>
          var k = n + 1
          while (counts.contains(s"$base.$k")) k += 1
          counts(base) = k
          counts(s"$base.$k") = 0
          s"$base.$k"
      }
    }
  }

  /** All rows of the first worksheet, cells as strings (null = absent). */
  private[sources] def readRows(path: String): Vector[Array[String]] = {
    val zip = new ZipFile(path)
    try {
      val shared = Option(zip.getEntry("xl/sharedStrings.xml"))
        .map(e => parseSharedStrings(newReader(zip, e))).getOrElse(Vector.empty)
      val sheetName = firstSheetPath(zip)
      val entry = Option(zip.getEntry(sheetName)).getOrElse(
        throw new IllegalArgumentException(s"xlsx: no worksheet at $sheetName in $path"))
      parseSheet(newReader(zip, entry), shared)
    } finally zip.close()
  }

  private def newReader(zip: ZipFile, e: java.util.zip.ZipEntry): XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(zip.getInputStream(e))
  }

  /** Resolve the first sheet in workbook order through workbook.xml.rels;
    * falls back to the conventional xl/worksheets/sheet1.xml. */
  private def firstSheetPath(zip: ZipFile): String = {
    val default = "xl/worksheets/sheet1.xml"
    val wb = Option(zip.getEntry("xl/workbook.xml")).getOrElse(return default)
    var firstRid: Option[String] = None
    val r = newReader(zip, wb)
    try {
      while (firstRid.isEmpty && r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
          val rid = (0 until r.getAttributeCount)
            .find(i => r.getAttributeLocalName(i) == "id")
            .map(r.getAttributeValue)
          firstRid = rid
        }
      }
    } finally r.close()
    val rid = firstRid.getOrElse(return default)
    val rels = Option(zip.getEntry("xl/_rels/workbook.xml.rels")).getOrElse(return default)
    var target: Option[String] = None
    val rr = newReader(zip, rels)
    try {
      while (target.isEmpty && rr.hasNext) {
        if (rr.next() == XMLStreamConstants.START_ELEMENT &&
            rr.getLocalName == "Relationship") {
          val attrs = (0 until rr.getAttributeCount)
            .map(i => rr.getAttributeLocalName(i) -> rr.getAttributeValue(i)).toMap
          if (attrs.get("Id").contains(rid)) target = attrs.get("Target")
        }
      }
    } finally rr.close()
    target.map { t =>
      val clean = t.stripPrefix("/")
      if (clean.startsWith("xl/")) clean else s"xl/$clean"
    }.getOrElse(default)
  }

  /** sharedStrings.xml → string table; rich-text runs concatenate their
    * <t> pieces, phonetic <rPh> runs are skipped (as spreadsheet apps do). */
  private def parseSharedStrings(r: XMLStreamReader): Vector[String] = {
    val out = ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inSi = false
    var phoneticDepth = 0
    var inT = false
    try {
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "si" => inSi = true; cur.clear()
          case "rPh" => phoneticDepth += 1
          case "t" if inSi && phoneticDepth == 0 => inT = true
          case _ =>
        }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA if inT =>
          cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "si" => inSi = false; out += cur.toString
          case "rPh" => phoneticDepth -= 1
          case "t" => inT = false
          case _ =>
        }
        case _ =>
      }
    } finally r.close()
    out.toVector
  }

  /** "BC7" → 0-based column index 54. */
  private[sources] def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  private def parseSheet(r: XMLStreamReader,
      shared: Vector[String]): Vector[Array[String]] = {
    val rows = ListBuffer.empty[Array[String]]
    var cells: ArrayBuffer[String] = null
    var nextCol = 0          // position when a cell carries no r="A1" ref
    var cellType = ""
    var cellCol = 0
    var inV = false
    var inIsT = false
    var hadValue = false     // a style-only <c/> must stay null, not ""
    val text = new StringBuilder
    def put(col: Int, v: String): Unit = {
      while (cells.length <= col) cells += null
      cells(col) = v
    }
    def finishCell(): Unit = {
      if (!hadValue) return
      val raw = text.toString
      val v = cellType match {
        case "s" =>
          val i = raw.trim.toInt
          if (i >= 0 && i < shared.length) shared(i) else null
        case "b" => if (raw.trim == "1") "True" else "False"
        case _ => raw // "str", "inlineStr" text, or plain numeric text
      }
      put(cellCol, v)
      text.clear()
    }
    try {
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "row" => cells = ArrayBuffer.empty[String]; nextCol = 0
          case "c" if cells != null =>
            val attrs = (0 until r.getAttributeCount)
              .map(i => r.getAttributeLocalName(i) -> r.getAttributeValue(i)).toMap
            cellCol = attrs.get("r").map(colIndex).getOrElse(nextCol)
            nextCol = cellCol + 1
            cellType = attrs.getOrElse("t", "")
            text.clear()
            hadValue = false
          case "v" => inV = true; hadValue = true
          case "t" if cellType == "inlineStr" => inIsT = true; hadValue = true
          case _ =>
        }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA
            if inV || inIsT =>
          text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "row" => rows += cells.toArray; cells = null
          case "c" if cells != null => finishCell()
          case "v" => inV = false
          case "t" => inIsT = false
          case _ =>
        }
        case _ =>
      }
    } finally r.close()
    rows.toVector
  }
}
