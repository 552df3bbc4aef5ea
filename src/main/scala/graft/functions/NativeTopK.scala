package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native bounded-heap top-k aggregate — the scalable replacement for the
  * window-function top-k idiom.
  *
  * `row_number().over(partitionBy(key).orderBy(v)) <= k` shuffles and
  * sorts EVERY row of the fact table per key. This aggregate keeps a
  * k-element min-heap per group on the map side, so the shuffle carries
  * at most k rows per (key, input partition) and nothing is ever fully
  * sorted — the classic distributed top-k. At 100 TB with k=10 the
  * window form moves the whole table; this moves ≈ k · |keys| ·
  * |partitions| rows.
  *
  * Results are deterministic: ordered by (sort_key DESC, id ASC), ties
  * broken by the id — identical to
  * `ORDER BY v DESC, id ASC ... row_number() <= k`.
  */
object NativeTopK {

  /** Fixed-size binary heap whose ROOT is the WORST kept element
    * (smallest key; on equal keys, largest id), so a better candidate
    * replaces the root in O(log k). */
  final class TopKHeap(val k: Int) {
    var size = 0
    val keys = new Array[Double](k)
    val ids = new Array[Long](k)

    // a is worse than b (a should sit closer to the root).
    // java.lang.Double.compare gives Spark's total order for doubles
    // (NaN greater than everything, NaN == NaN) — a plain `<` would
    // make NaN rows arrival-order dependent and diverge from the
    // `ORDER BY v DESC` window idiom this aggregate replaces.
    private def worse(ka: Double, ia: Long, kb: Double, ib: Long): Boolean = {
      val c = java.lang.Double.compare(ka, kb)
      c < 0 || (c == 0 && ia > ib)
    }

    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0) {
        val p = (i - 1) >> 1
        if (worse(keys(i), ids(i), keys(p), ids(p))) {
          val tk = keys(i); keys(i) = keys(p); keys(p) = tk
          val ti = ids(i); ids(i) = ids(p); ids(p) = ti
          i = p
        } else return
      }
    }

    private def siftDown(): Unit = {
      var i = 0
      while (true) {
        val l = 2 * i + 1
        val r = l + 1
        var w = i
        if (l < size && worse(keys(l), ids(l), keys(w), ids(w))) w = l
        if (r < size && worse(keys(r), ids(r), keys(w), ids(w))) w = r
        if (w == i) return
        val tk = keys(i); keys(i) = keys(w); keys(w) = tk
        val ti = ids(i); ids(i) = ids(w); ids(w) = ti
        i = w
      }
    }

    def add(key: Double, id: Long): Unit =
      if (size < k) {
        keys(size) = key; ids(size) = id; size += 1; siftUp(size - 1)
      } else if (worse(keys(0), ids(0), key, id)) {
        keys(0) = key; ids(0) = id; siftDown()
      }

    def mergeFrom(o: TopKHeap): Unit = {
      var i = 0
      while (i < o.size) { add(o.keys(i), o.ids(i)); i += 1 }
    }

    /** (key DESC, id ASC) — the emission order (same NaN-greatest total
      * order as the heap's comparator). */
    def sortedDesc: Array[(Double, Long)] = {
      val out = Array.tabulate(size)(i => (keys(i), ids(i)))
      scala.util.Sorting.stableSort(out,
        (a: (Double, Long), b: (Double, Long)) => {
          val c = java.lang.Double.compare(a._1, b._1)
          c > 0 || (c == 0 && a._2 < b._2)
        })
      out
    }
  }

  val resultType: StructType = StructType(Seq(
    StructField("sort_key", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false)))

  /** graft_top_k(sort_key, id, k): array<struct<sort_key,id>> of the k
    * largest (sort_key, id) pairs per group, ordered (key DESC, id ASC).
    * Rows whose sort key or id is null are skipped (standard aggregate
    * null semantics — unlike the window idiom, which ranks null keys
    * last and can surface them when a group has fewer than k non-null
    * rows). Inputs coerce to (double, long) at analysis time. */
  case class BoundedTopK(
      sortExpr: Expression, idExpr: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[TopKHeap]
      with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
    require(k > 0, "k must be positive")

    // Seq[DataType] (covariant) — AbstractDataType is private[sql]
    override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)
    override def children: Seq[Expression] = Seq(sortExpr, idExpr)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(resultType, containsNull = false)
    override def prettyName: String = "graft_top_k"

    override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

    override def update(h: TopKHeap, input: InternalRow): TopKHeap = {
      val s = sortExpr.eval(input)
      val i = idExpr.eval(input)
      if (s != null && i != null)
        h.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
      h
    }

    override def merge(h: TopKHeap, o: TopKHeap): TopKHeap = { h.mergeFrom(o); h }

    override def eval(h: TopKHeap): Any =
      new GenericArrayData(h.sortedDesc.map { case (key, id) =>
        InternalRow(key, id): Any
      })

    override def serialize(h: TopKHeap): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + 16 * h.size)
      bb.putInt(h.size)
      var i = 0
      while (i < h.size) { bb.putDouble(h.keys(i)); bb.putLong(h.ids(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): TopKHeap = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val n = bb.getInt()
      val h = new TopKHeap(k)
      var i = 0
      while (i < n) { h.add(bb.getDouble(), bb.getLong()); i += 1 }
      h
    }

    override def withNewMutableAggBufferOffset(o: Int): BoundedTopK =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): BoundedTopK =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(sortExpr = newChildren(0), idExpr = newChildren(1))
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Aggregate Column: top `k` (sortKey, id) pairs per group as
    * array<struct<sort_key,id>>, ordered (sort_key DESC, id ASC).
    * Inputs are cast to double/long. */
  def topK(sortKey: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      BoundedTopK(
        ColumnBridge.expression(sortKey.cast("double")),
        ColumnBridge.expression(id.cast("long")), k)
        .toAggregateExpression())

  /** The full per-group top-k shape shared by every caller: aggregate,
    * unpack, rank. Output: (groupCols…, rank int, idName long,
    * sortName double), ordered within each group by (sortName DESC,
    * idName ASC).
    *
    * The id column must already be integral: the heap stores ids as
    * LONG, and a lossy cast (string/decimal/double id) would null out
    * under a non-ANSI session and VANISH from the heap silently —
    * validated here, where the DataFrame's resolved schema is in hand,
    * so a bad id type fails loudly at plan time instead. */
  def topKPerGroup(
      df: org.apache.spark.sql.DataFrame, groupCols: Seq[String],
      sortKey: Column, id: Column, k: Int,
      sortName: String, idName: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, posexplode}
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val idType = df.select(id).schema.head.dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"graft_top_k: id column must be an integral type (it rides the " +
        s"heap as LONG), got ${idType.simpleString} — hash or " +
        "dictionary-encode non-numeric ids first and join them back")
    val g = groupCols.map(col)
    df.groupBy(g: _*).agg(topK(sortKey, id, k).as("__tops"))
      .select(g :+ posexplode(col("__tops")).as(Seq("__r", "__t")): _*)
      .select(g ++ Seq(
        (col("__r") + 1).cast("int").as("rank"),
        col("__t.id").as(idName),
        col("__t.sort_key").as(sortName)): _*)
  }

  /** k argument for the SQL registrations: an integer literal, validated
    * with a clean error instead of a runtime ClassCastException. */
  private[functions] def kOf(e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Number, _) =>
      v.intValue()
    case other => throw new IllegalArgumentException(
      s"graft_top_k: k must be an integer literal, got $other")
  }
}
