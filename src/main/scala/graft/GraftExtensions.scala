package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.{Bpe, BpeCountExpr, BpeTokenizeExpr, DamerauLevenshteinExpr, DeflateRatioExpr, DotProduct, JaroWinklerExpr, LibmLogExpr, NfcNormalizeExpr, SquaredL2, TryToInt, TryToLong}

/**
 * Session-extensions entry point: enables graft's native SQL functions
 * on any cluster without code changes —
 * `--conf spark.sql.extensions=graft.GraftExtensions` (or
 * `SparkSession.builder().withExtensions(new GraftExtensions)`).
 * The same expression builders back the imperative
 * [[graft.functions.Functions.register]] path.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functionList.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}

object GraftExtensions {
  /** Coerce SQL-path inputs to array<double> (float arrays are the
   *  common on-disk embedding type), matching the Column-API wrappers. */
  private def d(e: Expression): Expression = Cast(e, ArrayType(DoubleType))

  private def s(e: Expression): Expression =
    Cast(e, org.apache.spark.sql.types.StringType)

  /** (name, builder) for every injectable native function. SQL-path
   *  BPE uses the default embedded vocab (the Column API takes a
   *  caller-trained one). */
  val functionList: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (es => DotProduct(d(es(0)), d(es(1)))),
    "graft_sqdist" -> (es => SquaredL2(d(es(0)), d(es(1)))),
    "graft_try_int" -> (es => TryToInt(s(es(0)))),
    "graft_try_long" -> (es => TryToLong(s(es(0)))),
    "graft_nfc" -> (es => NfcNormalizeExpr(s(es(0)))),
    "graft_bpe_count" -> (es => BpeCountExpr(s(es(0)), Bpe.DefaultVocab)),
    "graft_bpe_tokenize" -> (es => BpeTokenizeExpr(s(es(0)), Bpe.DefaultVocab)),
    "graft_deflate_ratio" -> (es => DeflateRatioExpr(s(es(0)))),
    "graft_libm_log" -> (es => LibmLogExpr(Cast(es(0), DoubleType))),
    "graft_jaro_winkler" -> (es => JaroWinklerExpr(s(es(0)), s(es(1)))),
    "graft_damerau_levenshtein" ->
      (es => DamerauLevenshteinExpr(s(es(0)), s(es(1)))))
}
