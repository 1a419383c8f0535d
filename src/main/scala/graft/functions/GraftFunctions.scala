package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.operators.Dedup

/** SQL-surface registration for graft's custom expressions, so
  * `spark.sql("SELECT cosine_sim(a, b) ...")` works alongside the
  * Column API. Two paths:
  *
  *  - [[GraftFunctions.register]] — runtime, on an existing session;
  *  - [[GraftExtensions]] — via
  *    `spark.sql.extensions=graft.functions.GraftExtensions` or
  *    `.withExtensions(new GraftExtensions)` at session build.
  */
object GraftFunctions {

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (es => CosineSim(es(0), es(1))),
    "sign_lsh_bucket" -> (es => SignLshBucket(es.head, 8)),
    "simhash32" -> (es => SimHash32(es.head)),
    "char_sum" -> (es => CharSum(es.head)),
    "shingle_hashes" -> (es => ShingleHashes(es.head, 3)),
    "minhash_sig" -> (es => MinHashSig(es.head, 16,
      999983L, 424243L, 12345L, 7L, Dedup.P)))

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      ColumnBridge.registerFunction(spark, name, b)
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, b) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[GraftExtensions].getName, name),
        b))
    }
}
