package graft

import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** Gate-output schema guard: NO gate query may emit a DECIMAL column.
 *
 *  Round-11 lesson: the driver's correctness hash reads the spark
 *  parquet and the DuckDB oracle result through DIFFERENT decimal
 *  value paths, so a decimal gate column hash-mismatches even when
 *  the values are exactly equal — the only three decimal-output gates
 *  (q207/q214/q232) were precisely the round's only three hash fails,
 *  while the builder's pandas-based selfcheck (decimal → float64)
 *  masked it. Library operators may keep DECIMAL contracts (exact
 *  money, exact moments); gates must cast to double/bigint in BOTH
 *  the query and its oracle. scripts/selfcheck.py enforces the same
 *  rule on the written parquet.
 */
class GateSchemaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("no gate query emits a DECIMAL output column (driver-hash hazard)") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val decCols = fn(spark, dir).schema.fields.collect {
          case f if f.dataType.isInstanceOf[DecimalType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
        decCols
    }
    assert(offenders.isEmpty,
      s"decimal gate columns (cast to double/bigint in gate AND oracle):\n" +
        offenders.mkString("\n"))
  }
}
