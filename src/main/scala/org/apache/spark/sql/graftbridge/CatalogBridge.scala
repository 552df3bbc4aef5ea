package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.connector.catalog.{CatalogV2Util, Column}
import org.apache.spark.sql.types.StructType

/** Bridge to Spark's private[sql] v2-Column ↔ StructType conversions —
  * the catalog plugin surface hands schemas as `Column[]`, and the
  * canonical converters live behind the sql-package boundary. */
object CatalogBridge {
  def toStructType(columns: Array[Column]): StructType =
    CatalogV2Util.v2ColumnsToStructType(columns)
  def toV2Columns(schema: StructType): Array[Column] =
    CatalogV2Util.structTypeToV2Columns(schema)

  /** The session's current catalog name / namespace (`USE ...` state) —
    * the CatalogManager lives behind the sql-package boundary. */
  def currentCatalogName(spark: org.apache.spark.sql.SparkSession): String =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.catalogManager.currentCatalog.name()
  def currentNamespace(spark: org.apache.spark.sql.SparkSession): Array[String] =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.catalogManager.currentNamespace
}
