package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.expressions.{DotQuant6, Md5Prefix60, ShingleHash60}

/** SparkSessionExtensions hook registering the library's native
  * expressions as SQL functions. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (all the
  * library's mains and the test session do).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("md5prefix60"),
      new ExpressionInfo(classOf[Md5Prefix60].getName, "md5prefix60"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Md5Prefix60(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("dotq6"),
      new ExpressionInfo(classOf[DotQuant6].getName, "dotq6"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotQuant6(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("shinglehash60"),
      new ExpressionInfo(classOf[ShingleHash60].getName, "shinglehash60"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ShingleHash60(children.head,
          children(1).eval().asInstanceOf[Int])))
  }
}
