package org.apache.spark.sql.graftbridge

/** Bridge to Spark's `private[sql]`
  * [[org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback]] —
  * the marker `DataStreamWriter.toTable` consults to route a streaming
  * write on a v2 table through the table's V1 provider (`createSink`
  * at the table location; the shape Delta's table uses). As thin as
  * the other graftbridge shims: one empty subtrait so a table outside
  * the sql package can carry the marker; the single abstract member
  * (`v1Table: CatalogTable`) passes through. */
trait V1FallbackBridge
  extends org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback
