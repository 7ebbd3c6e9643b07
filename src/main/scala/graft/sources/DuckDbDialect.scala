package graft.sources

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects}
import org.apache.spark.sql.types._

/**
 * Minimal JDBC dialect for embedded DuckDB (the engine the upsert gate
 * executes its `ON CONFLICT` SQL against — Derby cannot parse it).
 *
 * Exists for one quirk: duckdb_jdbc's `ResultSetMetaData.isSigned`
 * reports false for integer columns, which routes Spark's default
 * mapping to the unsigned branch — BIGINT surfaces as DecimalType(20,0)
 * and readback rows carry BigDecimal instead of Long. DuckDB integers
 * ARE signed, so map the standard integral types by their JDBC type
 * code and leave everything else to the default dialect.
 */
object DuckDbDialect extends JdbcDialect {
  override def canHandle(url: String): Boolean = url.startsWith("jdbc:duckdb:")

  override def getCatalystType(sqlType: Int, typeName: String, size: Int,
                               md: org.apache.spark.sql.types.MetadataBuilder): Option[DataType] =
    sqlType match {
      case java.sql.Types.TINYINT  => Some(ByteType)
      case java.sql.Types.SMALLINT => Some(ShortType)
      case java.sql.Types.INTEGER  => Some(IntegerType)
      case java.sql.Types.BIGINT   => Some(LongType)
      case _ => None
    }

  /** Idempotent registration — call before any jdbc:duckdb: scan. */
  lazy val registered: Unit = JdbcDialects.registerDialect(this)
}
