package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType, LongType}

import graft.functions.VecDot

/** Optimizer rule: recognize the *declarative* brute-force cosine
  * top-k pattern — the window form any Spark user writes naturally
  * ([[graft.llm.Similarity.s01BruteForceTopK]]) — and swap in the
  * zero-shuffle [[CosineTopKPlan]] operator. The user keeps the
  * DataFrame API; the engine keeps the O(queries·k) physical plan (no
  * n·m candidate materialization, no exchange, no sort below the
  * presentation orderBy).
  *
  * Matched shape (the OPTIMIZED form — collapsed projects, the
  * row_number filter, Spark's inserted WindowGroupLimit):
  *
  * {{{
  * Filter (rn <= k)
  * +- Window [row_number() over (partition qid order cos DESC, nid ASC) AS rn]
  *    +- [WindowGroupLimit]
  *       +- Project [qid, nid, vec_dot(qv,cv)/(qn*cn) AS cos]
  *          +- Join Inner, NOT (qid = nid)
  *             :- Project [id AS qid, vec AS qv, SQRT(vec_dot(vec,vec)) AS qn]
  *             :  +- <queries side, zero-norm-filtered>
  *             +- Project [id AS nid, vec AS cv, SQRT(vec_dot(vec,vec)) AS cn]
  *                +- <index side, zero-norm-filtered>
  * }}}
  *
  * Every structural condition is checked by expression id — the cosine
  * must really be the dot of the two sides' vectors over the product of
  * their own norms, the window must partition on the left id and break
  * ties ascending on the right id — so the rule either proves the
  * pattern and rewrites, or leaves the plan untouched. The replacement
  * keeps each side's pre-existing Filter (zero-norm/null guards), keeps
  * the original output attribute ids (parent Project/Sort re-resolve
  * untouched), and hands (id, vec) to the operator positionally per its
  * contract.
  *
  * The rule is NOT registered globally: s01 is the engine's *declared*
  * quadratic baseline and must keep its window plan for the s01-vs-s04
  * contrast. [[graft.llm.Similarity.s06AutoRewrite]] demonstrates the
  * rewrite in a child session (own optimizer, shared SparkContext).
  */
object CosineTopKRewrite extends Rule[LogicalPlan] {

  /** (id, vec, alias ids, child-with-filters) from one join side. */
  private def matchSide(plan: LogicalPlan)
      : Option[(Attribute, Attribute, ExprId, ExprId, ExprId, LogicalPlan)] =
    plan match {
      case Project(Seq(
          idAlias @ Alias(id: AttributeReference, _),
          vecAlias @ Alias(vec: AttributeReference, _),
          normAlias @ Alias(Sqrt(VecDot(n1: AttributeReference,
            n2: AttributeReference)), _)), child)
          if id.dataType == LongType &&
            (vec.dataType match {
              case ArrayType(FloatType, _) => true
              case _ => false
            }) &&
            // the norm must be the norm OF THIS SIDE'S vector
            n1.exprId == vec.exprId && n2.exprId == vec.exprId =>
        Some((id, vec, idAlias.exprId, vecAlias.exprId, normAlias.exprId,
          child))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // k >= 1: CosineTopKExec's bounded-heap kernel requires a positive
    // capacity; rn <= 0 stays on the window plan (zero rows, correctly)
    case f @ Filter(
        LessThanOrEqual(rnUse: Attribute, Literal(k: Int, IntegerType)),
        w: Window) if k >= 1 =>
      rewrite(rnUse, k, w).getOrElse(f)
  }

  private def rewrite(rnUse: Attribute, k: Int, w: Window)
      : Option[LogicalPlan] = {
    // 1. the window computes exactly one row_number
    val (rnAlias, spec) = w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(RowNumber(), s), _)) => (a, s)
      case _ => return None
    }
    if (rnAlias.exprId != rnUse.exprId) return None

    // 2. unwrap the optimizer's WindowGroupLimit if present
    val belowWindow = w.child match {
      case WindowGroupLimit(_, _, RowNumber(), limit, child)
          if limit >= k => child
      case other => other
    }

    // 3. the cosine projection over the inequality join
    val (qidAttr, nidAttr, cosAlias, dotQ, dotC, normQ, normC, join) =
      belowWindow match {
        case Project(Seq(qid: AttributeReference, nid: AttributeReference,
            cos @ Alias(Divide(
              VecDot(dq: AttributeReference, dc: AttributeReference),
              Multiply(nq: AttributeReference, nc: AttributeReference, _),
              _), _)), j: Join) =>
          (qid, nid, cos, dq, dc, nq, nc, j)
        case _ => return None
      }
    val (left, right) = join match {
      case Join(l, r, Inner, Some(Not(EqualTo(a: Attribute, b: Attribute))), _)
          if Set(a.exprId, b.exprId) == Set(qidAttr.exprId, nidAttr.exprId) =>
        (l, r)
      case _ => return None
    }

    // 4. window spec: partition by the query id, order cosine DESC
    //    NULLS LAST then neighbor id ASC NULLS FIRST
    val specOk = (w.partitionSpec, w.orderSpec) match {
      case (Seq(p: Attribute),
          Seq(SortOrder(c1: Attribute, Descending, NullsLast, _),
            SortOrder(n1: Attribute, Ascending, NullsFirst, _))) =>
        p.exprId == qidAttr.exprId && c1.exprId == cosAlias.exprId &&
          n1.exprId == nidAttr.exprId &&
          spec.partitionSpec.forall {
            case a: Attribute => a.exprId == qidAttr.exprId
            case _ => false
          }
      case _ => false
    }
    if (!specOk) return None

    // 5. both sides project (id, vec, sqrt(vec_dot(vec, vec)))
    val (lId, lVec, lIdAliasId, lVecAliasId, lNormAliasId, lChild) =
      matchSide(left).getOrElse(return None)
    val (rId, rVec, rIdAliasId, rVecAliasId, rNormAliasId, rChild) =
      matchSide(right).getOrElse(return None)

    // 6. the projected cosine must wire left-to-left and right-to-right:
    //    qid/nid from the side id aliases, dot over the two vec aliases,
    //    denominator over the two norm aliases
    val wiredOk =
      qidAttr.exprId == lIdAliasId && nidAttr.exprId == rIdAliasId &&
        dotQ.exprId == lVecAliasId && dotC.exprId == rVecAliasId &&
        normQ.exprId == lNormAliasId && normC.exprId == rNormAliasId
    if (!wiredOk) return None

    // Proven. Children keep their own filters (zero-norm/null guards);
    // the operator reads (id, vec) positionally and recomputes norms in
    // its kernel. Output reuses the original attribute ids so the
    // parent Project/Sort resolve unchanged.
    Some(CosineTopKPlan(
      queries = Project(Seq(lId, lVec), lChild),
      index = Project(Seq(rId, rVec), rChild),
      k = k,
      output = Seq(qidAttr, rnAlias.toAttribute, nidAttr,
        cosAlias.toAttribute)))
  }
}
