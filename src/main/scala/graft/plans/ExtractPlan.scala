package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.StructType
import graft.extract.{Extracted, Extractor, Page}

/**
 * Whole-operator Catalyst surface for the extraction stage (SURVEY.md §2
 * custom-operator preference (c)): a logical `ExtractNode`, a planner
 * `ExtractStrategy` (injected via `spark.sql.extensions`), and a physical
 * `ExtractExec` that converts scan rows straight to output rows —
 * bypassing the Dataset.map encoder round-trip — while making the
 * operator visible in `explain()` as `GraftExtract`.
 *
 * Usage: `GraftExtract(pagesDf)` (Scala), with
 * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
 */
case class ExtractNode(
    child: LogicalPlan,
    override val output: Seq[Attribute] = ExtractNode.freshOutput())
  extends UnaryNode {
  // consumes every input column — stops ColumnPruning from emptying the child
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    child.outputSet
  override protected def withNewChildInternal(newChild: LogicalPlan): ExtractNode =
    copy(child = newChild) // output attrs (exprIds) stay stable across copies
}

object ExtractNode {
  val schema: StructType = ExpressionEncoder[Extracted]().schema
  val inputColumns: Seq[String] = Seq("url", "warc_ts", "html", "text", "lang")
  def freshOutput(): Seq[Attribute] = schema.fields.toSeq.map(f =>
    AttributeReference(f.name, f.dataType, f.nullable)())
}

object ExtractStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case node @ ExtractNode(child, _) =>
      ExtractExec(node.output, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class ExtractExec(output: Seq[Attribute], child: SparkPlan) extends UnaryExecNode {
  override def nodeName: String = "GraftExtract"

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    def idx(name: String): Int = {
      val i = childOutput.indexWhere(_.name == name)
      require(i >= 0, s"ExtractNode input is missing column '$name'")
      i
    }
    val (iUrl, iTs, iHtml, iText, iLang) =
      (idx("url"), idx("warc_ts"), idx("html"), idx("text"), idx("lang"))

    child.execute().mapPartitions { rows =>
      val serializer = ExpressionEncoder[Extracted]().createSerializer()
      rows.map { row =>
        val page = Page(
          url = if (row.isNullAt(iUrl)) null else row.getUTF8String(iUrl).toString,
          warc_ts = if (row.isNullAt(iTs)) null
            else DateTimeUtils.toJavaTimestamp(row.getLong(iTs)),
          html = if (row.isNullAt(iHtml)) null else row.getBinary(iHtml),
          text = if (row.isNullAt(iText)) "" else row.getUTF8String(iText).toString,
          lang = if (row.isNullAt(iLang)) "" else row.getUTF8String(iLang).toString)
        serializer(Extractor.extract(page)).copy()
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): ExtractExec =
    copy(child = newChild)
}

/** Public API: plan-level extraction operator over a pages DataFrame. */
object GraftExtract {
  def apply(pages: DataFrame): DataFrame = {
    val spark = pages.sparkSession
    val projected = pages.selectExpr(ExtractNode.inputColumns: _*)
    GraftSqlShim.ofRows(spark, ExtractNode(GraftSqlShim.logicalPlan(projected)))
  }
}
