package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One oracle-checked query: a Spark implementation plus (when
  * SQL-expressible) the equivalent DuckDB SQL the driver hash-compares
  * against. `oracle = None` downgrades to the driver's rows-only check.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
