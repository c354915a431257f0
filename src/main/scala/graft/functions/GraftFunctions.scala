package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftshim.ExprShim
import org.apache.spark.sql.types.{IntegerType, LongType}

/** SQL surface for the custom Catalyst expressions: registers
  * `vec_cosine`, `minhash_sig`, `simhash_fp`, `sorted_intersect_size`,
  * `shingle_sorted_hashes`, `hyperplane_sketch` and
  * `normalized_token_hash` so `spark.sql("SELECT vec_cosine(a,b) …")`
  * and `expr("…")`/set_expr transformer chains can use them.
  *
  * Two registration paths:
  *   - config: `--conf spark.sql.extensions=graft.GraftExtensions`
  *     (the standard [[SparkSessionExtensions]] injection point);
  *   - live session: `GraftFunctions.register(spark)`.
  */
object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType)   => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }

  private def arity(es: Seq[Expression], n: Int, name: String): Unit =
    require(es.size == n, s"$name expects $n arguments, got ${es.size}")

  /** (name, builder) for every SQL-exposed graft function. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_cosine" -> { es =>
      arity(es, 2, "vec_cosine"); VectorExprs.VecCosine(es(0), es(1))
    },
    "sorted_intersect_size" -> { es =>
      arity(es, 2, "sorted_intersect_size")
      VectorExprs.SortedIntersectSize(es(0), es(1))
    },
    "minhash_sig" -> { es =>
      arity(es, 2, "minhash_sig")
      VectorExprs.MinHashSig(es(0), intArg(es(1), "minhash_sig k"))
    },
    "simhash_fp" -> { es =>
      arity(es, 1, "simhash_fp"); VectorExprs.SimHashFp(es(0))
    },
    "shingle_sorted_hashes" -> { es =>
      arity(es, 2, "shingle_sorted_hashes")
      VectorExprs.ShingleSortedHashes(es(0), intArg(es(1), "shingle n"))
    },
    "hyperplane_sketch" -> { es =>
      arity(es, 2, "hyperplane_sketch")
      VectorExprs.HyperplaneSketch(es(0), intArg(es(1), "planes"))
    },
    "normalized_token_hash" -> { es =>
      arity(es, 1, "normalized_token_hash"); TextExprs.NormalizedTokenHash(es(0))
    })

  /** Register every graft function on a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      ExprShim.registerFunction(spark, name, builder)
    }
}
