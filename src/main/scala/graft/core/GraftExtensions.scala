package graft.core

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{ArrayDot, WordShingles}

/** Engine extensions registered through the sanctioned
  * `SparkSessionExtensions` hook (`spark.sql.extensions=graft.core.
  * GraftExtensions`, wired by [[Sessions.configure]]): makes the native
  * expressions first-class SQL functions, so `spark.sql("SELECT
  * word_shingles(text, 3) ...")` plans the same codegen'd operator the
  * DataFrame API uses — no separate SQL/DataFrame capability surface. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => args match {
        case Seq(text, Literal(n: Int, _)) if n >= 1 => WordShingles(text, n)
        case Seq(text) => WordShingles(text, 3)
        case _ => throw new IllegalArgumentException(
          "word_shingles(text[, n]) — n must be an integer literal >= 1")
      }))
    ext.injectFunction((
      new FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => ArrayDot(a, b)
        case _ => throw new IllegalArgumentException("array_dot(a, b)")
      }))
  }
}
