package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.dedup.{MinHashSigExpr, ShingleHashExpr}
import graft.functions._

/** SparkSessionExtensions entry point — the standard deployment route for
  * the engine's custom Catalyst expressions:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions()).getOrCreate()
  * }}}
  *
  * Every function is injected into the session's FunctionRegistry at build
  * time, so `spark.sql("SELECT fingerprint(text) ...")` works in any session
  * carrying the extension — no per-session register() calls. The same
  * builder list backs [[Sql.register]]'s temp-function registration, so the
  * two routes cannot drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
}

object GraftExtensions {

  private def oneArg(name: String)(f: Expression => Expression)
  : Seq[Expression] => Expression = {
    case Seq(e) => f(e)
    case other => throw new IllegalArgumentException(
      s"$name expects 1 argument, got ${other.length}")
  }

  /** (name, builder) for every SQL-spellable custom expression. The
    * constant-centroid vector forms (sq_dist_const, argmin_const) have no
    * SQL-literal spelling and stay Column-API-only.
    */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "fingerprint" -> oneArg("fingerprint")(FingerprintExpr(_)),
    "simhash64" -> oneArg("simhash64")(SimHashExpr(_)),
    "quality_margin" -> oneArg("quality_margin")(QualityMarginExpr(_)),
    "quality_features" -> oneArg("quality_features")(QualityFeaturesExpr(_)),
    "vec_dot" -> {
      case Seq(a, b) => DotVecExpr(a, b)
      case other => throw new IllegalArgumentException(
        s"vec_dot expects 2 arguments, got ${other.length}")
    },
    "vec_norm" -> oneArg("vec_norm")(NormVecExpr(_)),
    // stopword_count(text, 'w1,w2,...') — the word list must be a string
    // literal (it is baked into the codegen'd kernel as a constant)
    "stopword_count" -> {
      case Seq(text, Literal(words: UTF8String, StringType)) =>
        StopwordCountExpr(text,
          words.toString.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      case _ => throw new IllegalArgumentException(
        "stopword_count expects (text, 'w1,w2,...' literal)")
    },
    // shingle_hashes(token_array, n) — n must be an int literal (it sizes
    // the codegen'd kernel's gram window); same for minhash_sig's k
    "shingle_hashes" -> {
      case Seq(toks, Literal(n: Int, IntegerType)) if n > 0 => ShingleHashExpr(toks, n)
      case _ => throw new IllegalArgumentException(
        "shingle_hashes expects (array<string>, positive int literal)")
    },
    "minhash_sig" -> {
      case Seq(hashes, Literal(k: Int, IntegerType)) if k > 0 => MinHashSigExpr(hashes, k)
      case _ => throw new IllegalArgumentException(
        "minhash_sig expects (array<bigint>, positive int literal)")
    },
    "sorted_intersect" -> {
      case Seq(a, b) => SortedIntersectExpr(a, b)
      case other => throw new IllegalArgumentException(
        s"sorted_intersect expects 2 arguments, got ${other.length}")
    },
    "vdelta_pack" -> oneArg("vdelta_pack")(VdeltaPackExpr(_)),
    "vdelta_unpack" -> oneArg("vdelta_unpack")(VdeltaUnpackExpr(_)),
    "vdelta_intersect" -> {
      case Seq(a, b) => VdeltaIntersectExpr(a, b)
      case other => throw new IllegalArgumentException(
        s"vdelta_intersect expects 2 arguments, got ${other.length}")
    },
    "gopher_stats" ->
      oneArg("gopher_stats")(graft.operators.GopherStatsExpr(_)),
    "gopher_line_stats" ->
      oneArg("gopher_line_stats")(graft.operators.GopherLineStatsExpr(_)))
}
