package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Shared customer↔supplier trade-graph construction (q107 PageRank,
  * q127 BFS): nodes are 2·custkey / 2·suppkey+1 (disjoint id spaces),
  * edges both directions so no node dangles. The pair subtree (fact
  * join + distinct) is checkpointed ONCE — the bidirectional union
  * would otherwise execute it twice, and every iterative consumer
  * re-reads the materialized form.
  */
object TradeGraph {

  /** Directed edge list (src, dst), both directions of each trade pair. */
  def edges(s: SparkSession, d: String): DataFrame = {
    // orders pruned to two longs broadcasts into the fact scan — the
    // pair extraction is one lineitem pass + one distinct shuffle
    val pairs = Tables.lineitem(s, d)
      .join(broadcast(Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"))),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("a"),
        (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
      .localCheckpoint(eager = false)
    pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(pairs.select(col("b").as("src"), col("a").as("dst")))
  }
}
