package graft

import org.apache.spark.sql.Column

package object adtl {
  /** function-style alias for Column.try_cast (null on failed cast — the
    * Python try-int/try-float fallback shape). */
  def try_cast(c: Column, t: String): Column = c.try_cast(t)
}
