package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._

/** User-WHERE passthrough safety (SURVEY.md §2.2 P2, §7 "hard parts").
  *
  * The reference sanitizes with a regex blocklist (engine.py:32-45,539-563:
  * forbidden DDL/DML keywords, `;`, comment tokens, UNION, nested SELECT).
  * We reproduce those observable rejections first (so its five sanitizer
  * test vectors behave identically), then go stronger: parse the clause
  * with Spark's SQL parser and allowlist expression node types — a
  * structural guarantee a regex can't give.
  */
object WhereSanitizer {

  private val ForbiddenKeywords = Seq(
    "drop", "delete", "insert", "update", "alter", "create", "truncate",
    "exec", "execute", "grant", "revoke", "union", "attach", "detach",
    "pragma", "copy", "install", "load")

  private val AllowedFunctions = Set(
    "between", // BETWEEN parses as UnresolvedFunction("between", ...)
    "upper", "lower", "abs", "round", "floor", "ceil", "ceiling", "length",
    "trim", "ltrim", "rtrim", "coalesce", "substring", "substr", "concat",
    "year", "month", "day", "date_trunc", "to_date", "to_timestamp", "cast")

  final case class SanitizeException(msg: String)
    extends IllegalArgumentException(msg)

  /** Validate; returns the clause unchanged or throws [[SanitizeException]]. */
  def sanitize(spark: SparkSession, where: String): String = {
    val lower = where.toLowerCase
    if (where.contains(";")) fail("semicolon not allowed")
    if (where.contains("--") || where.contains("/*") || where.contains("*/"))
      fail("comment tokens not allowed")
    ForbiddenKeywords.foreach { kw =>
      if (s"\\b$kw\\b".r.findFirstIn(lower).isDefined)
        fail(s"forbidden keyword: $kw")
    }
    if ("\\bselect\\b".r.findFirstIn(lower).isDefined)
      fail("subqueries not allowed")

    val parsed =
      try spark.sessionState.sqlParser.parseExpression(where)
      catch { case e: Exception => fail(s"unparseable WHERE: ${e.getMessage}") }
    validate(parsed)
    where
  }

  private def fail(msg: String): Nothing =
    throw SanitizeException(s"invalid WHERE clause: $msg")

  private def validate(e: Expression): Unit = {
    e match {
      case _: Literal | _: AttributeReference => ()
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        val _ = a
      case _: And | _: Or | _: Not => ()
      case _: EqualTo | _: EqualNullSafe | _: LessThan | _: LessThanOrEqual |
           _: GreaterThan | _: GreaterThanOrEqual => ()
      case _: In | _: Like | _: RLike => ()
      case _: IsNull | _: IsNotNull => ()
      case _: Add | _: Subtract | _: Multiply | _: Divide | _: Remainder |
           _: UnaryMinus => ()
      case _: Cast => ()
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
        val name = f.nameParts.last.toLowerCase
        if (!AllowedFunctions.contains(name)) fail(s"function not allowed: $name")
      case other =>
        fail(s"expression not allowed: ${other.getClass.getSimpleName}")
    }
    e.children.foreach(validate)
  }
}
