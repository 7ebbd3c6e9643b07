package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JSONOptions, JacksonParser}
import org.apache.spark.sql.catalyst.util.FailureSafeParser
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/**
 * Executor-side JSON-record → InternalRow parsing for the `graft-http`
 * DSv2 source. Lives in an `org.apache.spark.sql` subpackage because
 * Catalyst's JSON machinery (`JacksonParser`, `JSONOptions`,
 * `FailureSafeParser`) is `private[sql]` — the same access-shim
 * pattern as [[org.apache.spark.graft.BenchInternals]]. Nothing here
 * reimplements parsing: it is exactly the parser stack
 * `spark.read.json(Dataset[String])` runs, so the DSv2 reader's rows
 * are bit-identical to the driver-walk path's — including PERMISSIVE /
 * DROPMALFORMED / FAILFAST malformed-record semantics — while parsing
 * where the data is fetched instead of shipping page bodies anywhere.
 */
object JsonRows {

  /** A serializable-free factory: call on the EXECUTOR (the returned
   *  function captures a per-call JacksonParser, which is not
   *  thread-safe and not serializable). `schema` may be any subset of
   *  the table schema — Jackson skips unmatched fields, which is what
   *  makes DSv2 column pruning effective at parse time, not just at
   *  projection time. */
  def parser(schema: StructType, timeZoneId: String,
             mode: String): String => Iterator[InternalRow] = {
    val corruptCol = "_corrupt_record"
    val opts = new JSONOptions(
      Map("mode" -> mode, "columnNameOfCorruptRecord" -> corruptCol),
      timeZoneId)
    val raw = new JacksonParser(schema, opts, allowArrayAsStructs = true)
    val safe = new FailureSafeParser[String](
      input => raw.parse(input, CreateJacksonParser.string, UTF8String.fromString),
      opts.parseMode, schema, corruptCol)
    (s: String) => safe.parse(s)
  }
}
