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
}
