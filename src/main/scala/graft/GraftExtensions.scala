package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.GraftExprBridge
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{F, Text, Vectors}

/** SQL surface of the engine: registers graft's column functions as SQL
  * functions via [[SparkSessionExtensions]], so every operator is reachable
  * from `spark.sql(...)` — the reference's users speak SQL (dbt models,
  * probe scripts; SURVEY §3), and a switch to this library must not force
  * them through the Scala API.
  *
  * Registration is injectFunction only — no custom parser/rules needed; the
  * functions expand to Catalyst trees (built-ins + graft's native
  * expressions), so Catalyst optimizes through them exactly as in the
  * DataFrame API. Enabled by default in [[GraftSession]]; external sessions
  * opt in with `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    register(ext, "graft_surrogate_key", "dbt_utils-compatible md5 surrogate key",
      children => exprOf(F.surrogateKey(children.map(colOf): _*)))
    register(ext, "graft_hash60", "60-bit md5-derived hash of a string",
      children => exprOf(Vectors.hash60(colOf(children.head))))
    register(ext, "graft_fingerprint", "md5 fingerprint of normalized text",
      children => exprOf(Text.fingerprint(colOf(children.head))))
    register(ext, "graft_simhash", "32-bit simhash of normalized text",
      children => exprOf(Text.simhash32(colOf(children.head))))
    register(ext, "graft_shingles", "distinct word n-gram shingles: (text, n)",
      children => exprOf(Text.shingleSet(colOf(children.head), intArg(children, 1))))
    register(ext, "graft_minhash_bands", "MinHash LSH band keys: (shingles, perms, bands)",
      children => exprOf(Text.minhashBands(
        colOf(children.head), intArg(children, 1), intArg(children, 2))))
    register(ext, "float_dot", "dot product of two float arrays",
      children => graft.functions.FloatDotProduct(children.head, children(1)))
    register(ext, "graft_token_count", "whitespace token count",
      children => exprOf(Text.tokenCount(colOf(children.head))))
    register(ext, "graft_bpe_token_count", "BPE-ish subword chunk count",
      children => exprOf(Text.bpeTokenCount(colOf(children.head))))
  }
}

object GraftExtensions {

  private def colOf(e: Expression) = GraftExprBridge.column(e)
  private def exprOf(c: org.apache.spark.sql.Column) = GraftExprBridge.resolvedExpression(c)

  /** Extract a compile-time int argument (e.g. shingle width) — must be a
    * foldable literal, like the built-in functions require for such args. */
  private def intArg(children: Seq[Expression], pos: Int): Int =
    children(pos) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"argument ${pos + 1} must be an integer literal, got $other")
    }

  private def register(ext: SparkSessionExtensions, name: String, usage: String,
      builder: Seq[Expression] => Expression): Unit =
    ext.injectFunction((
      FunctionIdentifier(name),
      // 2-arg ctor: (className, functionName); usage strings ride in the
      // scaladoc — the 3-arg overload's middle argument is the DATABASE.
      new ExpressionInfo("graft.GraftExtensions", name),
      builder))
}
