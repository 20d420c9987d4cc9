package graft

import org.apache.spark.sql.types.{DataType, DecimalType, StructType, ArrayType, MapType, StructField}

/** Output-dtype hygiene for every gate query.
  *
  * The driver's correctness compare hashes STRINGIFIED cells after reading
  * both sides into pandas. Two dtype classes hash-mismatch even when every
  * value is numerically equal:
  *
  *   - a Spark DECIMAL output column round-trips as `Decimal("157.00")`
  *     while the DuckDB oracle's decimal lands as float64 `157.0`;
  *   - a DuckDB HUGEINT (the type of `sum(BIGINT)`) lands as float64
  *     `840.0` while Spark's long prints `840`.
  *
  * Round 9 lost six otherwise-perfect gates to exactly this
  * (CORRECTNESS_r09.json: q_anomaly_zscore, q_decay_score, q_gap_fill,
  * q_user_feature_mart, t_hashing_tfidf, t_heavy_hitters — all
  * rows+schema green, hash red). The house rule is therefore: DECIMAL is
  * an INTERNAL type (order-invariant sums) that never reaches a gate's
  * output schema — cast to double at the edge. This spec pins the rule
  * for the whole surface; schemas resolve lazily (no execution), so the
  * sweep is cheap. The HUGEINT half lives in the oracles and is enforced
  * by tools/verify_local.py's stringify_mismatch pass.
  */
class GateSchemaSpec extends SparkSpec {

  private def decimalLeaves(dt: DataType, path: String): Seq[String] =
    dt match {
      case _: DecimalType => Seq(path)
      case s: StructType =>
        s.fields.flatMap { case StructField(n, t, _, _) =>
          decimalLeaves(t, s"$path.$n")
        }.toSeq
      case a: ArrayType => decimalLeaves(a.elementType, s"$path[]")
      case m: MapType =>
        decimalLeaves(m.keyType, s"$path<key>") ++
          decimalLeaves(m.valueType, s"$path<value>")
      case _ => Nil
    }

  test("no gate query exposes a DECIMAL column in its output schema") {
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sf/documents.parquet").exists())
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val schema =
          try fn(spark, sf).schema
          catch {
            // a query that cannot even resolve its plan fails its own
            // gate/spec; this spec only owns the dtype rule
            case e: Throwable =>
              fail(s"$name: schema resolution threw ${e.getMessage}")
          }
        decimalLeaves(schema, name)
    }
    assert(offenders.isEmpty,
      s"DECIMAL must not reach a gate output (cast to double at the " +
        s"edge); offenders: ${offenders.mkString(", ")}")
  }
}
