package graft.operators

import org.apache.spark.sql.functions._

import graft.core._

/** Pluggable `batch → Seq[batch]` hook — the reference's compute
  * extension surface (`Transformer`, `types.go:86-88` in
  * /root/reference). The Seq return keeps the 1→N table-fanout the
  * signature allows (one input batch may emit several destination
  * tables), the reference's UDTF-shaped hook.
  */
trait Transformer {
  def name: String
  def apply(batch: TableBatch, params: Params): Seq[TableBatch]
}

/** Identity — wraps rows in one batch (`transformer_default.go:8-21`). */
object DefaultTransformer extends Transformer {
  val name = "default"
  def apply(batch: TableBatch, params: Params): Seq[TableBatch] = Seq(batch)
}

/** Redirects the batch to the destination table named by the `TableName`
  * parameter, falling back to the incoming name
  * (`transformer_tablerenamer.go:9-33`).
  */
object TableRenamerTransformer extends Transformer {
  val name = "tablerenamer"
  def apply(batch: TableBatch, params: Params): Seq[TableBatch] =
    Seq(batch.copy(table = params.tableName.getOrElse(batch.table)))
}

/** Spark-idiomatic realisation of the reference's scripted-UDF hook
  * (`transformer_js.go:24-84` — an embedded JS interpreter whose script
  * execution is a stub). Instead of an interpreter we accept Catalyst
  * expression strings per output column: `expressions: name -> exprSql`.
  * Expressions stay inside whole-stage codegen — a real scripting VM in
  * the row path would be orders of magnitude slower at scale.
  */
object ExprTransformer extends Transformer {
  val name = "expr"
  def apply(batch: TableBatch, params: Params): Seq[TableBatch] = {
    val df = params.expressions.foldLeft(batch.df) { case (d, (c, e)) =>
      d.withColumn(c, expr(e))
    }
    Seq(batch.copy(df = df))
  }
}
