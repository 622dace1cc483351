package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{
  And, Attribute, EqualTo, Expression, GreaterThanOrEqual,
  IsNotNull, LessThanOrEqual, PredicateHelper, Unevaluable}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType, StructType}

/** SQL-text spelling for the native as-of join — the `injectParser`
  * tier of the extension ladder (the one tier [[GraftExtensions]] had
  * not exercised). Accepts DuckDB's surface syntax
  *
  * {{{  left ASOF [LEFT | INNER] JOIN right
  *        ON l.k = r.k [AND …] AND r.ts <= l.ts          }}}
  *
  * and lowers it to [[AsOfJoinNode]] (→ the sorted-merge
  * [[AsOfJoinExec]]), so the IDENTICAL query text runs verbatim on
  * this engine and on DuckDB — the q27 shared-ANSI-text discipline
  * extended to an operator ANSI SQL does not have.
  *
  * How it lowers (three cooperating pieces, because the parsed tree is
  * unresolved and [[AsOfJoinNode]] needs resolved children):
  *
  *  1. [[GraftSqlParser]] — a delegating [[ParserInterface]]: scans the
  *     statement text with string literals / quoted identifiers /
  *     comments masked, replaces each `ASOF [LEFT|INNER] JOIN` with the
  *     plain join keyword, and hands the rewritten text to Spark's own
  *     parser. Everything non-ASOF takes the delegate path untouched.
  *  2. Marking — in the parsed (still unresolved) tree, each join that
  *     came from an ASOF rewrite gets [[GraftAsOfMarker]] AND-ed onto
  *     its condition. The rewritten joins are found STRUCTURALLY (a
  *     join of the right type whose ON clause has the as-of shape:
  *     ≥1 equality conjunct + exactly one `>=`/`<=` conjunct); the
  *     match count must equal the rewrite count, so a statement that
  *     also contains a PLAIN join with an as-of-shaped range condition
  *     is rejected loudly (split the statement) rather than guessed at.
  *     Marking (not direct conversion) is what lets the standard
  *     analyzer do ALL the hard work first: `DeduplicateRelations`
  *     de-aliases self-join attribute collisions for `Join` nodes, and
  *     `Join.resolved` implies the two sides' outputs are disjoint —
  *     guarantees a custom unresolved node would have had to rebuild.
  *  3. [[ResolveAsOfJoin]] — an injected resolution rule: once a marked
  *     join IS resolved, it splits the conjuncts, assigns each side by
  *     attribute ownership, normalizes the inequality to
  *     `leftTs >= rightTs`, and emits [[AsOfJoinNode]] — plus an
  *     `IS NOT NULL` filter on the right timestamp for the INNER
  *     variant (DuckDB's default `ASOF JOIN` drops unmatched left
  *     rows; `ASOF LEFT JOIN` null-pads, which is the node's native
  *     semantics).
  *
  * The marker is [[Unevaluable]]: if a marked join ever escaped the
  * rule (it cannot — the rule throws on any marked join it cannot
  * convert), execution would fail loudly instead of silently running a
  * plain join with different semantics.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    AsOfSqlRewrite(sqlText, delegate.parsePlan)
  override def parseQuery(sqlText: String): LogicalPlan =
    AsOfSqlRewrite(sqlText, delegate.parseQuery)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** Analysis-time tag for a join produced by an `ASOF … JOIN` rewrite.
  * Lives only between parse and [[ResolveAsOfJoin]]; never executed. */
case class GraftAsOfMarker() extends Unevaluable {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = this
}

object AsOfSqlRewrite extends PredicateHelper {

  private val AsOfRe =
    """(?i)\bASOF\s+(?:(LEFT|INNER)\s+)?JOIN\b""".r

  /** One keyword replacement: [origStart, origEnd) of the original text
    * became [rwStart, rwEnd) of the rewritten text. */
  private final case class Rw(
      origStart: Int, origEnd: Int, rwStart: Int, rwEnd: Int)

  def apply(sqlText: String, parse: String => LogicalPlan): LogicalPlan = {
    val masked = maskNonCode(sqlText)
    val hits = AsOfRe.findAllMatchIn(masked).toSeq
    if (hits.isEmpty) return parse(sqlText)
    // splice the plain join keyword over each ASOF occurrence,
    // recording the span mapping (view-text restore needs it below)
    val sb = new StringBuilder
    var pos = 0
    var nLeft = 0
    var nInner = 0
    val spans = Seq.newBuilder[Rw]
    hits.foreach { m =>
      sb.append(sqlText.substring(pos, m.start))
      val rwStart = sb.length
      val isLeft = Option(m.group(1)).exists(_.equalsIgnoreCase("LEFT"))
      if (isLeft) { nLeft += 1; sb.append("LEFT JOIN") }
      else { nInner += 1; sb.append("JOIN") }
      spans += Rw(m.start, m.end, rwStart, sb.length)
      pos = m.end
    }
    sb.append(sqlText.substring(pos))
    val rewritten = sb.toString
    val plan = parse(rewritten)
    patchViewTexts(
      mark(plan, sqlText, nInner = nInner, nLeft = nLeft),
      sqlText, rewritten, spans.result())
  }

  /** CREATE/ALTER VIEW statements store the QUERY TEXT and re-parse it
    * on every later read — but the text the delegate captured is the
    * REWRITTEN one, where `ASOF` is gone, so a re-parse would silently
    * run a plain join with different semantics (caught by
    * AsOfSqlSpec's view test). Restore the ORIGINAL fragment by
    * mapping the stored substring's offsets back through the
    * recorded keyword replacements. */
  private def patchViewTexts(
      plan: LogicalPlan, orig: String, rw: String,
      spans: Seq[Rw]): LogicalPlan = {
    def back(frag: String): String = {
      val a = rw.indexOf(frag)
      if (a < 0) return frag // not a fragment of this statement
      val b = a + frag.length
      val intersects =
        spans.exists(s => s.rwStart < b && s.rwEnd > a)
      if (!intersects) return frag // no ASOF inside the view text
      if (rw.indexOf(frag, a + 1) >= 0)
        throw new IllegalArgumentException(
          "cannot uniquely locate the view query text inside an ASOF " +
            "JOIN statement (the fragment repeats); simplify the " +
            "statement or create the view from the DataFrame API")
      require(
        spans.forall(s =>
          s.rwEnd <= a || s.rwStart >= b ||
            (s.rwStart >= a && s.rwEnd <= b)),
        "rewritten ASOF span straddles the stored view-text boundary")
      def toOrig(p: Int): Int =
        p + spans.filter(_.rwEnd <= p)
          .map(s => (s.origEnd - s.origStart) - (s.rwEnd - s.rwStart)).sum
      orig.substring(toOrig(a), toOrig(b))
    }
    plan.transformDown {
      case c: org.apache.spark.sql.execution.command.CreateViewCommand
          if c.originalText.isDefined =>
        c.copy(originalText = c.originalText.map(back))
      case c: org.apache.spark.sql.catalyst.plans.logical.CreateView
          if c.originalText.isDefined =>
        c.copy(originalText = c.originalText.map(back))
      case c: org.apache.spark.sql.execution.command.AlterViewAsCommand =>
        c.copy(originalText = back(c.originalText))
    }
  }

  /** AND the marker onto every as-of-shaped join of each rewritten
    * type, insisting the structural matches tally with the text
    * rewrites — over-matching means the statement ALSO has a plain
    * join whose ON clause looks as-of-shaped, and guessing which was
    * which would silently change semantics. */
  private def mark(
      plan: LogicalPlan, original: String,
      nInner: Int, nLeft: Int): LogicalPlan = {
    var sawInner = 0
    var sawLeft = 0
    val marked = plan.transformUp {
      case j @ Join(_, _, Inner, Some(cond), _)
          if nInner > 0 && isAsOfShaped(cond) =>
        sawInner += 1
        j.copy(condition = Some(And(cond, GraftAsOfMarker())))
      case j @ Join(_, _, LeftOuter, Some(cond), _)
          if nLeft > 0 && isAsOfShaped(cond) =>
        sawLeft += 1
        j.copy(condition = Some(And(cond, GraftAsOfMarker())))
    }
    if (sawInner != nInner || sawLeft != nLeft)
      throw new IllegalArgumentException(
        s"ASOF JOIN rewrite is ambiguous in this statement: the text has " +
          s"$nInner ASOF [INNER] JOIN + $nLeft ASOF LEFT JOIN, but " +
          s"$sawInner inner + $sawLeft left joins carry an as-of-shaped ON " +
          "clause (equality conjuncts plus exactly one >=/<= conjunct). " +
          "A plain JOIN with an as-of-shaped range condition cannot share " +
          "a statement with ASOF JOIN — split the statement or rewrite " +
          "the plain join's condition.\n" + original)
    marked
  }

  /** Pre-resolution shape test: every conjunct an equality except
    * exactly one non-strict inequality. */
  private def isAsOfShaped(cond: Expression): Boolean = {
    val cs = splitConjunctivePredicates(cond)
    val ineq = cs.count {
      case _: GreaterThanOrEqual | _: LessThanOrEqual => true
      case _ => false
    }
    val eq = cs.count(_.isInstanceOf[EqualTo])
    ineq == 1 && eq >= 1 && eq + ineq == cs.size
  }

  /** Mask string literals ('' with '' escapes), double-quoted strings,
    * backtick identifiers, `--` and bracketed comments with spaces, so
    * keyword scanning never fires inside them. Length-preserving. */
  private[plans] def maskNonCode(s: String): String = {
    val out = s.toCharArray
    var i = 0
    def blank(from: Int, until: Int): Unit = {
      var j = from
      while (j < until) { if (!out(j).isWhitespace) out(j) = ' '; j += 1 }
    }
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' | '"' | '`' =>
          val q = s.charAt(i)
          var j = i + 1
          var closed = false
          while (j < s.length && !closed) {
            if (s.charAt(j) == '\\' && q != '`' && j + 1 < s.length) j += 2
            else if (s.charAt(j) == q) {
              // doubled quote = escaped quote inside the literal
              if (j + 1 < s.length && s.charAt(j + 1) == q) j += 2
              else { closed = true; j += 1 }
            } else j += 1
          }
          blank(i, j); i = j
        case '-' if i + 1 < s.length && s.charAt(i + 1) == '-' =>
          var j = i
          while (j < s.length && s.charAt(j) != '\n') j += 1
          blank(i, j); i = j
        case '/' if i + 1 < s.length && s.charAt(i + 1) == '*' =>
          val end = s.indexOf("*/", i + 2)
          val j = if (end < 0) s.length else end + 2
          blank(i, j); i = j
        case _ => i += 1
      }
    }
    new String(out)
  }
}

/** Lowers marked joins (see [[AsOfSqlRewrite]]) to [[AsOfJoinNode]]
  * once resolved. Registered via `injectResolutionRule`, so it runs
  * inside the analyzer's fixpoint — AFTER `DeduplicateRelations` has
  * made the two sides' outputs disjoint (`Join.resolved` implies it)
  * and attribute ownership is decidable. */
object ResolveAsOfJoin extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case j @ Join(l, r, jt, Some(cond), _)
          if j.resolved && cond.exists(_.isInstanceOf[GraftAsOfMarker]) =>
        val cs = splitConjunctivePredicates(cond)
          .filterNot(_.isInstanceOf[GraftAsOfMarker])
        def side(e: Expression): Option[Boolean] =
          if (e.references.nonEmpty && e.references.subsetOf(l.outputSet))
            Some(true)
          else if (e.references.nonEmpty && e.references.subsetOf(r.outputSet))
            Some(false)
          else None
        def oriented(a: Expression, b: Expression): (Expression, Expression) =
          (side(a), side(b)) match {
            case (Some(true), Some(false)) => (a, b)
            case (Some(false), Some(true)) => (b, a)
            case _ => fail(j,
              s"each ASOF JOIN conjunct must compare one left-side " +
                s"expression with one right-side expression; got ${a.sql} " +
                s"vs ${b.sql}")
          }
        val (eqs, ineqs) = cs.partition(_.isInstanceOf[EqualTo])
        val keys = eqs.map { case EqualTo(a, b) => oriented(a, b) }
        // normalize to leftTs >= rightTs ("right at or before left")
        val (lts, rts) = ineqs match {
          case Seq(GreaterThanOrEqual(a, b)) =>
            val (x, y) = oriented(a, b)
            if (x eq a) (a, b)
            else fail(j, "ASOF requires left_ts >= right_ts (or the " +
              "mirrored <=); this GE has the right side first")
          case Seq(LessThanOrEqual(a, b)) =>
            val (x, _) = oriented(a, b)
            if (x eq b) (b, a)
            else fail(j, "ASOF requires right_ts <= left_ts (or the " +
              "mirrored >=); this LE has the left side first")
          case other => fail(j,
            s"ASOF JOIN needs exactly one >=/<= conjunct, got " +
              s"${other.map(_.sql).mkString(", ")}")
        }
        if (keys.isEmpty) fail(j, "ASOF JOIN needs at least one equality")
        val node = AsOfJoinNode(l, r, keys.map(_._1), keys.map(_._2), lts, rts)
        jt match {
          case LeftOuter => node
          case Inner =>
            // DuckDB's default ASOF JOIN is inner: drop unmatched left
            // rows. The node is natively left-outer; matched ⇔ the right
            // timestamp is non-null (null-ts right rows never match, so
            // a non-null rts in the output can only come from a match).
            val rtsOut = rts.references.toSeq match {
              case Seq(a: Attribute) =>
                node.output.find(_.exprId == a.exprId).getOrElse(a)
              case _ => rts
            }
            Filter(IsNotNull(rtsOut), node)
          case other =>
            fail(j, s"ASOF with join type $other is not supported")
        }
    }

  private def fail(j: Join, msg: String): Nothing =
    throw new IllegalArgumentException(
      s"cannot lower ASOF JOIN: $msg\n${j.simpleString(5)}")
}
