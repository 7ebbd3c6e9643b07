package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}

/**
 * Sink facades — the reference's writer surface (goetl writers)
 * over Spark's writers, plus the one genuinely custom sink: JDBC
 * upsert (SURVEY.md §7.2).
 *
 * Capability map (SURVEY.md §2.10):
 *  - CSV w/ header/delimiter (`writers/csv.go:141-281`)   → [[csv]]
 *  - JSONL (`writers/json.go:132-269`)                    → [[jsonl]]
 *  - Parquet w/ compression/row-group (`writers/parquet.go:165-446`)
 *    → [[parquet]]
 *  - Postgres append + CREATE TABLE (`writers/postgresql.go:219-497`)
 *    → [[jdbcAppend]] (Spark JDBC creates the table from the schema)
 *  - Postgres UPSERT `ON CONFLICT DO NOTHING/UPDATE`
 *    (`writers/postgresql.go:529-576`) → [[jdbcUpsert]] — no Spark
 *    built-in; per-partition batched prepared statements
 *
 * The reference's writer-side batch buffers (`writers/csv.go:202-207`
 * etc.) have no analogue: Spark writes partition files in one pass;
 * `batchSize` survives only on the JDBC upsert path where statement
 * batching is real.
 */
object Sinks {

  /** `columns` fixes the field order (reference `writers/csv.go:188-199`
   *  writes a caller-supplied column order); `crlf` emits \r\n line
   *  endings (`writers/csv.go` UseCRLF). */
  def csv(df: DataFrame, path: String, header: Boolean = true,
          delimiter: String = ",", mode: String = "overwrite",
          columns: Seq[String] = Seq.empty, crlf: Boolean = false): Unit = {
    val ordered = if (columns.nonEmpty) df.select(columns.map(df.col): _*) else df
    val w = ordered.write.mode(mode)
      .option("header", header).option("delimiter", delimiter)
    (if (crlf) w.option("lineSep", "\r\n") else w).csv(path)
  }

  def jsonl(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).json(path)

  /** `rowGroupBytes` maps to `parquet.block.size` (reference row-group
   *  size knob, `writers/parquet.go:342-353`) — larger groups favor
   *  scan throughput, smaller favor row-group pruning granularity.
   *  `maxRecordsPerFile` caps file size for shard-sized outputs
   *  (training loaders want uniform shards, not one file per task);
   *  `sortWithin` sorts rows inside each output file (locality for
   *  downstream range scans / sequential readers) without a global
   *  exchange. */
  def parquet(df: DataFrame, path: String, compression: String = "snappy",
              mode: String = "overwrite",
              partitionBy: Seq[String] = Seq.empty,
              rowGroupBytes: Option[Long] = None,
              maxRecordsPerFile: Option[Long] = None,
              sortWithin: Seq[String] = Seq.empty): Unit = {
    val sorted =
      if (sortWithin.isEmpty) df
      else df.sortWithinPartitions(sortWithin.map(org.apache.spark.sql.functions.col): _*)
    var w = sorted.write.mode(mode).option("compression", compression)
    rowGroupBytes.foreach(n => w = w.option("parquet.block.size", n.toString))
    maxRecordsPerFile.foreach(n => w = w.option("maxRecordsPerFile", n.toString))
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /**
   * Z-ORDERED parquet: rows clustered along a Morton (Z-order) curve
   * over `zCols`, so every output file covers a compact range in ALL
   * the z dimensions at once — min/max file and row-group statistics
   * then prune scans filtered on ANY of the columns, not just a sort
   * leader. The data-layout tool for 100 TB fact tables queried along
   * several independent dimensions (the OPTIMIZE ZORDER pattern of
   * modern lakehouse engines, expressed as a plain write).
   *
   * Mechanics: one stats pass collects min/max per z column; each
   * value maps to a `bitsPerCol`-bit bucket (`width_bucket` over the
   * range — codegen'd arithmetic, no UDF), buckets interleave bitwise
   * into a single z value, and `repartitionByRange(files, z)` +
   * `sortWithinPartitions(z)` lays rows out along the curve (range
   * partitioning samples — no global sort). The z column is dropped
   * before writing.
   *
   * Null values and degenerate (constant/empty) columns bucket to 0.
   * Uniform bucketing degrades (but never breaks) under heavy skew —
   * a skewed dimension concentrates buckets; pruning on the OTHER
   * dimensions still holds. Correctness is layout-independent: the
   * rows written are exactly `df`'s.
   */
  def parquetZOrdered(df: DataFrame, path: String, zCols: Seq[String],
                      files: Int, bitsPerCol: Int = 12,
                      compression: String = "snappy",
                      saveMode: String = "overwrite"): Unit = {
    import org.apache.spark.sql.functions._
    require(zCols.nonEmpty, "parquetZOrdered needs at least one z column")
    require(files > 0, s"files must be positive, got $files")
    val n = zCols.size
    require(bitsPerCol >= 1 && bitsPerCol * n <= 62,
      s"bitsPerCol*|zCols| must fit a long: $bitsPerCol*$n")
    // numeric dimensions only (ANSI cast of a string would throw at
    // runtime); order non-numerics by pre-projecting, e.g. unix_micros
    // for timestamps or xxhash64 for opaque ids
    zCols.foreach { c =>
      val dt = df.schema(c).dataType
      require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"z column '$c' must be numeric, got $dt")
    }
    val buckets = 1L << bitsPerCol
    val statAggs = zCols.flatMap(c =>
      Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
    val stats = df.agg(statAggs.head, statAggs.tail: _*).head()
    val bucketCols = zCols.zipWithIndex.map { case (c, i) =>
      if (stats.isNullAt(2 * i) || stats.getDouble(2 * i) == stats.getDouble(2 * i + 1))
        lit(0L)
      else {
        val (lo, hi) = (stats.getDouble(2 * i), stats.getDouble(2 * i + 1))
        val wb = width_bucket(col(c).cast("double"), lit(lo), lit(hi),
          lit(buckets)) - lit(1)
        coalesce(least(lit(buckets - 1), greatest(lit(0L), wb.cast("long"))),
          lit(0L))
      }
    }
    val z = (0 until bitsPerCol).flatMap { b =>
      bucketCols.zipWithIndex.map { case (bc, ci) =>
        shiftleft(shiftright(bc, b).bitwiseAND(lit(1L)), b * n + ci)
      }
    }.reduce(_ bitwiseOR _)
    val zc = graft.core.Engine.freshColumn(df, "__graft_zval")
    df.withColumn(zc, z)
      .repartitionByRange(files, col(zc))
      .sortWithinPartitions(zc)
      .drop(zc)
      .write.mode(saveMode).option("compression", compression).parquet(path)
  }

  /** Plain-text sink: the single string column becomes one line per
   *  row. Compression via codec name ("gzip", "none", …) — compressed
   *  text shards are the interchange format for raw corpora. */
  def text(df: DataFrame, path: String, compression: String = "none",
           mode: String = "overwrite"): Unit =
    df.write.mode(mode).option("compression", compression).text(path)

  /** XML sink (Spark 4 built-in; one `rowTag` element per row,
   *  values entity-escaped). Compression via codec name. */
  def xml(df: DataFrame, path: String, rowTag: String = "row",
          compression: String = "none", mode: String = "overwrite"): Unit =
    df.write.mode(mode).format("xml")
      .option("rowTag", rowTag).option("compression", compression).save(path)

  /** ORC sink (built-in columnar alternative to [[parquet]]). */
  def orc(df: DataFrame, path: String, compression: String = "snappy",
          mode: String = "overwrite",
          partitionBy: Seq[String] = Seq.empty): Unit = {
    val w = df.write.mode(mode).option("compression", compression)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  /**
   * Bucketed + sorted parquet table (catalog-managed): joins and
   * aggregations on the bucket keys skip the shuffle entirely when
   * both sides share the bucketing — the co-located-join tool for
   * repeatedly-joined 100 TB fact tables. (Plain `parquet()` paths
   * can't carry bucket metadata; this writes through the session
   * catalog via `saveAsTable`.)
   */
  def parquetBucketed(df: DataFrame, table: String, buckets: Int,
                      bucketKeys: Seq[String],
                      mode: String = "overwrite"): Unit = {
    if (mode == "overwrite") {
      // genuinely overwrite: a managed-table LOCATION can outlive the
      // (session-scoped) catalog entry — e.g. a fresh JVM over the same
      // warehouse dir — and saveAsTable refuses to adopt an orphan
      // location (LOCATION_ALREADY_EXISTS). DROP removes a registered
      // managed table (data included). The name is parsed as the SQL
      // parser would (`db.tbl` is two parts — backtick-quoting it as
      // one would DROP the wrong table while deleting db.tbl's
      // directory), and the directory is only deleted when NO catalog
      // table — under any name — is registered at that location: a
      // directory at the assigned path with a registered owner is live
      // data (e.g. an external table), not an orphan.
      val spark = df.sparkSession
      import org.apache.spark.sql.GraftShims
      val ident = GraftShims.parseTableIdentifier(spark, table)
      spark.sql(s"DROP TABLE IF EXISTS ${GraftShims.quoted(ident)}")
      val locUri = GraftShims.defaultTablePath(spark, table)
      if (!GraftShims.tableRegisteredAt(spark, ident.database, locUri)) {
        val loc = new org.apache.hadoop.fs.Path(locUri)
        val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(loc)) fs.delete(loc, true)
      }
    }
    df.write.mode(mode)
      .format("parquet")
      .bucketBy(buckets, bucketKeys.head, bucketKeys.tail: _*)
      .sortBy(bucketKeys.head, bucketKeys.tail: _*)
      .saveAsTable(table)
  }

  /** `truncate` empties the table instead of DROP+CREATE on overwrite
   *  (reference TRUNCATE management mode, `writers/postgresql.go:666-687`
   *  — preserves grants/indexes); `createTableColumnTypes` overrides
   *  inferred DDL types, e.g. `"name VARCHAR(64), price DECIMAL(18,2)"`
   *  (reference type inference, `writers/postgresql.go:478-497`). */
  def jdbcAppend(df: DataFrame, url: String, table: String,
                 user: String = "", password: String = "",
                 batchSize: Int = 1000, mode: String = "append",
                 truncate: Boolean = false,
                 createTableColumnTypes: Option[String] = None): Unit = {
    if (url.startsWith("jdbc:duckdb:")) graft.sources.DuckDbDialect.registered
    val props = new java.util.Properties()
    if (user.nonEmpty) { props.put("user", user); props.put("password", password) }
    props.put("batchsize", batchSize.toString)
    if (truncate) props.put("truncate", "true")
    createTableColumnTypes.foreach(t => props.put("createTableColumnTypes", t))
    df.write.mode(mode).jdbc(url, table, props)
  }

  /** Create a table with an explicit column-definition list and an
   *  optional PRIMARY KEY — the upsert path needs a unique constraint
   *  on its conflict columns (`ON CONFLICT` refuses to infer one
   *  otherwise, in PostgreSQL and DuckDB alike), and Spark's JDBC
   *  writer cannot declare constraints. `colDefs` is spliced verbatim
   *  (it is DDL by nature, e.g. `"id BIGINT, name VARCHAR"`); table
   *  and key identifiers go through the allowlist. */
  def jdbcCreateTable(url: String, table: String, colDefs: String,
                      primaryKey: Seq[String] = Nil,
                      replace: Boolean = false,
                      user: String = "", password: String = ""): Unit = {
    val pk = if (primaryKey.isEmpty) ""
      else s", PRIMARY KEY (${primaryKey.map(q).mkString(", ")})"
    val verb = if (replace) "CREATE OR REPLACE TABLE" else "CREATE TABLE"
    val props = new java.util.Properties()
    if (user.nonEmpty) { props.put("user", user); props.put("password", password) }
    val conn = java.sql.DriverManager.getConnection(url, props)
    try conn.createStatement().execute(s"$verb ${q(table)} ($colDefs$pk)")
    finally conn.close()
  }

  /** Conflict resolution modes (reference `writers/postgresql.go:529-576`). */
  sealed trait OnConflict
  /** Plain INSERT — conflicts raise (reference "error" mode). */
  case object ConflictError extends OnConflict
  /** `ON CONFLICT DO NOTHING`. */
  final case class ConflictIgnore(conflictCols: Seq[String]) extends OnConflict
  /** `ON CONFLICT (cols) DO UPDATE SET c = EXCLUDED.c`. */
  final case class ConflictUpdate(conflictCols: Seq[String],
                                  updateCols: Seq[String]) extends OnConflict

  private def q(ident: String): String = {
    // Identifier allowlist (reference validates identifiers,
    // writers/postgresql.go:438-444) — refuse anything needing quoting
    // games; these strings are spliced into SQL.
    require(ident.matches("[A-Za-z_][A-Za-z0-9_]*"), s"invalid SQL identifier: $ident")
    "\"" + ident + "\""
  }

  /** Build the upsert statement (PostgreSQL dialect). Pure function —
   *  unit-testable without a database. */
  def upsertSql(table: String, columns: Seq[String], onConflict: OnConflict): String = {
    require(columns.nonEmpty, "upsertSql needs at least one column")
    val base = s"INSERT INTO ${q(table)} (${columns.map(q).mkString(", ")}) " +
      s"VALUES (${columns.map(_ => "?").mkString(", ")})"
    onConflict match {
      case ConflictError => base
      case ConflictIgnore(cc) =>
        require(cc.nonEmpty, "ConflictIgnore needs conflict columns")
        s"$base ON CONFLICT (${cc.map(q).mkString(", ")}) DO NOTHING"
      case ConflictUpdate(cc, uc) =>
        require(cc.nonEmpty && uc.nonEmpty, "ConflictUpdate needs conflict + update columns")
        s"$base ON CONFLICT (${cc.map(q).mkString(", ")}) DO UPDATE SET " +
          uc.map(c => s"${q(c)} = EXCLUDED.${q(c)}").mkString(", ")
    }
  }

  /** Write telemetry returned by [[jdbcUpsert]] (reference
   *  WriterStats: RecordsWritten / ConflictCount / error counters,
   *  `writers/postgresql.go:579-663`). `conflicted` = rows whose batch
   *  execute reported 0 affected rows (`ON CONFLICT DO NOTHING` hit);
   *  `failedRows`/`failedBatches` = rows in batches a lenient run
   *  rolled back and skipped. */
  final case class UpsertStats(inserted: Long, conflicted: Long,
                               failedBatches: Long, failedRows: Long)

  /** Interpret one JDBC `executeBatch` result as (inserted, conflicted,
   *  failed): per-statement update counts of 0 are conflicts
   *  (`DO NOTHING` matched an existing row — reference conflict
   *  detection via RowsAffected==0); positive counts and
   *  SUCCESS_NO_INFO are inserts; EXECUTE_FAILED (and any other
   *  negative count a continue-on-error driver surfaces) are failures,
   *  NOT inserts. Pure — unit-testable without a database. */
  def interpretBatchCounts(counts: Array[Int]): (Long, Long, Long) = {
    var ins = 0L; var con = 0L; var fail = 0L
    counts.foreach { c =>
      if (c == 0) con += 1
      else if (c > 0 || c == java.sql.Statement.SUCCESS_NO_INFO) ins += 1
      else fail += 1 // Statement.EXECUTE_FAILED (-3) et al.
    }
    (ins, con, fail)
  }

  /**
   * JDBC upsert: per-partition connections, batched prepared
   * statements, one transaction per batch (reference flush semantics,
   * `writers/postgresql.go:579-663`). Tune write parallelism with
   * `df.repartition(n)` before calling — each partition holds one
   * connection, so n = the DB's comfortable concurrent-writer count.
   *
   * Telemetry: returns [[UpsertStats]] aggregated across partitions
   * via accumulators — inserted vs conflicted comes from the batch
   * update counts, so `ON CONFLICT DO NOTHING` hit rates are
   * observable instead of silent (reference ConflictCount).
   *
   * Error budget (reference MaxErrors circuit breaker,
   * `writers/postgresql.go:275-311`): a batch that fails with a
   * SQLException is rolled back; with `maxFailedBatchesPerPartition`
   * > 0 the partition skips it, counts it, and continues — until the
   * budget is exhausted, at which point the breaker trips and the
   * exception propagates (failing the task). The default budget of 0
   * keeps strict fail-fast semantics. The budget is per PARTITION
   * (each holds its own connection) — the distributed analogue of the
   * reference's single-writer error count. NOTE: a tripped/retried
   * task re-runs its whole partition; committed batches from the
   * first attempt are not rolled back (same at-least-once contract
   * the per-batch transactions already imply — idempotent for
   * DO NOTHING/DO UPDATE, not for plain INSERT).
   */
  def jdbcUpsert(df: DataFrame, url: String, table: String,
                 onConflict: OnConflict,
                 user: String = "", password: String = "",
                 batchSize: Int = 1000,
                 maxFailedBatchesPerPartition: Int = 0): UpsertStats = {
    val columns = df.columns.toSeq
    val sql = upsertSql(table, columns, onConflict)
    val sc = df.sparkSession.sparkContext
    val insertedAcc = sc.longAccumulator("graft.upsert.inserted")
    val conflictedAcc = sc.longAccumulator("graft.upsert.conflicted")
    val failedBatchesAcc = sc.longAccumulator("graft.upsert.failedBatches")
    val failedRowsAcc = sc.longAccumulator("graft.upsert.failedRows")
    df.foreachPartition { (rows: Iterator[Row]) =>
      val props = new java.util.Properties()
      if (user.nonEmpty) { props.put("user", user); props.put("password", password) }
      val conn = java.sql.DriverManager.getConnection(url, props)
      var failedHere = 0
      try {
        conn.setAutoCommit(false)
        val stmt = conn.prepareStatement(sql)
        var inBatch = 0
        def flush(): Unit = if (inBatch > 0) {
          try {
            val counts = stmt.executeBatch()
            conn.commit()
            val (ins, con, fail) = interpretBatchCounts(counts)
            insertedAcc.add(ins); conflictedAcc.add(con)
            failedRowsAcc.add(fail)
          } catch {
            case e: java.sql.SQLException =>
              try conn.rollback() catch { case _: java.sql.SQLException => () }
              // drivers differ on whether a failed batch self-clears
              try stmt.clearBatch() catch { case _: java.sql.SQLException => () }
              failedHere += 1
              failedBatchesAcc.add(1); failedRowsAcc.add(inBatch)
              if (failedHere > maxFailedBatchesPerPartition) throw e
          }
          inBatch = 0
        }
        rows.foreach { row =>
          columns.indices.foreach(i => stmt.setObject(i + 1, row.get(i)))
          stmt.addBatch()
          inBatch += 1
          if (inBatch >= batchSize) flush()
        }
        flush()
      } finally conn.close()
    }
    UpsertStats(insertedAcc.value, conflictedAcc.value,
      failedBatchesAcc.value, failedRowsAcc.value)
  }
}
