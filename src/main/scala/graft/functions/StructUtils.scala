package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Flat↔nested struct utilities — the Spark analog of the reference's
  * dotted-dict `flat()`/`unflat()` round-trip (etl_cli/base.py:298,523;
  * SURVEY §1.1). Used by `_flat=1` (F7) and schema-free tolerant writes.
  */
object StructUtils {

  /** All leaf paths of a schema in dotted form. */
  def leafPaths(schema: StructType, prefix: String = ""): Seq[String] =
    schema.fields.toSeq.flatMap { f =>
      val p = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      f.dataType match {
        case st: StructType => leafPaths(st, p)
        case _              => Seq(p)
      }
    }

  /** `_flat=1`: flatten nested structs into top-level columns named
    * `a_b_c` (reference flattens to dotted keys, base.py:545-546; we use
    * `_` so names stay parquet/SQL-safe).
    */
  def flatten(df: DataFrame): DataFrame = {
    val cols = leafPaths(df.schema).map(p => col(p).as(p.replace('.', '_')))
    if (cols.isEmpty) df else df.select(cols.toIndexedSeq: _*)
  }

  /** Inverse of [[flatten]]: group `a_b` columns back into struct `a`.
    * Only used by tests for the round-trip property; production writes
    * keep the flat shape.
    */
  def nest(df: DataFrame, sep: Char = '_'): DataFrame = {
    // Build a tree of column name parts.
    sealed trait Node
    case class Leaf(colName: String) extends Node
    case class Branch(children: scala.collection.mutable.LinkedHashMap[String, Node]) extends Node
    val root = Branch(scala.collection.mutable.LinkedHashMap())
    df.columns.foreach { c =>
      val parts = c.split(sep).toList
      var cur = root
      var collided = false
      parts.init.foreach { p =>
        if (!collided) cur.children.getOrElseUpdate(
            p, Branch(scala.collection.mutable.LinkedHashMap())) match {
          case b: Branch => cur = b
          case _: Leaf   => collided = true // "a" exists flat; "a_b" stays flat
        }
      }
      // reverse collision: a Branch "a" already exists when flat column
      // "a" arrives — it must also stay flat under its full name
      if (!collided && cur.children.get(parts.last).exists(_.isInstanceOf[Branch]))
        collided = true
      if (collided) root.children.getOrElseUpdate(c, Leaf(c))
      else cur.children.getOrElseUpdate(parts.last, Leaf(c))
    }
    def build(name: String, node: Node): Column = node match {
      case Leaf(c)   => col(c).as(name)
      case Branch(ch) =>
        struct(ch.toSeq.map { case (n, sub) => build(n, sub) }: _*).as(name)
    }
    df.select(root.children.toSeq.map { case (n, sub) => build(n, sub) }.toIndexedSeq: _*)
  }
}
