package graft.operators

import graft.spec.TransformStage
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** J9 named merge rules (reference: `--mrules`/`--mrules-scm` →
  * `merger.merge_rules`, resolved by name in the server-side morpher
  * module, etl_cli/etl.py:51-52,178-180 and base.py:87-94).
  *
  * A merge rule decides how a SHARED column's matched merger value
  * combines with the source value — replacing the direction overlay
  * (J2's coalesce) for the columns in scope. Rules are pure Column
  * functions `(sourceValue, mergerValue) => merged`, so they stay
  * inside whole-stage codegen; on unmatched left-join rows the merger
  * side is null and every built-in degrades to the source value.
  *
  * `--mrules NAME` picks the rule; `--mrules-scm c1,c2` limits it to
  * those shared columns (default: all shared columns). Custom rules
  * register like transformers ([[register]]).
  */
object MergeRules {

  /** (source value, merger value) → merged value. */
  type Rule = (Column, Column) => Column

  private val registry = scala.collection.concurrent.TrieMap[String, Rule](
    // the direction overlays, by name
    "prefer_merger" -> ((s, m) => coalesce(m, s)),
    "prefer_source" -> ((s, m) => coalesce(s, m)),
    // numeric combines (null on either side → the other side)
    "sum" -> ((s, m) => when(s.isNotNull && m.isNotNull, s + m).otherwise(coalesce(s, m))),
    "min" -> ((s, m) => least(s, m)),   // least/greatest skip nulls
    "max" -> ((s, m) => greatest(s, m)),
    // string append
    "concat" -> ((s, m) =>
      when(s.isNotNull && m.isNotNull, concat(s, m)).otherwise(coalesce(s, m))))

  def register(name: String, rule: Rule): Unit = registry.update(name, rule)
  def names: Seq[String] = registry.keys.toSeq.sorted

  /** Resolve a spec stage into (rule, column scope). Empty scope =
    * every shared column.
    */
  def resolve(stage: TransformStage): (Rule, Set[String]) = {
    val rule = registry.getOrElse(stage.name,
      throw new IllegalArgumentException(
        s"unknown merge rule: ${stage.name} (known: ${names.mkString(", ")})"))
    (rule, stage.args.map(_.trim).filter(_.nonEmpty).toSet)
  }
}
