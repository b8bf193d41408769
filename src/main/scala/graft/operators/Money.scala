package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.{DecimalType, TimestampType}

/** The ONE copy of the decimal-precision discipline every oracled query
  * depends on (previously triplicated across Relational / TpchSuite /
  * SqlFunctions — the widths must stay in lockstep or bit-exact DuckDB
  * parity silently breaks).
  *
  * Precisions are chosen so the chained money expression
  * price * (1-disc) * (1+tax) stays within Spark's 38-digit decimal limit
  * with NO intermediate rounding: (1 +/- x) is (2,0)+(6,4) -> (7,4), so the
  * chain is (12,2) x (7,4) -> (20,6) x (7,4) -> (28,10) <= 38 digits exact
  * (multiply: p1+p2+1, s1+s2). At wider inputs the last product would
  * exceed 38 and Spark silently rounds — which breaks DuckDB bit-parity.
  * A bare lit(1) is decimal(10,0) after implicit cast and inflates the
  * chain the same way; decimal(2,0) keeps it exact.
  */
private[operators] object Money {
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))
  def dec4(c: Column): Column = c.cast(DecimalType(6, 4))
  val one: Column = lit(1).cast(DecimalType(2, 0))
  def ts(s: String): Column = lit(s).cast(TimestampType)
}
