package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable quantile + frequent-items sketches as native Catalyst
  * aggregates over the DataSketches library Spark already ships for its
  * own `hll_sketch_agg` (datasketches-java 6.2, `/opt/spark/jars`).
  *
  * These are the remaining two of the three classic mergeable summaries
  * a 100 TB lake needs alongside HLL ([[graft.analytics.Sketches]]):
  *
  *  - KLL quantiles: exact percentiles don't re-aggregate — a per-shard
  *    p95 cannot be combined into a global p95, so every new rollup
  *    grain rescans the fact table. A KLL sketch is a ≤ few-KB summary
  *    whose merge carries the SAME rank-error guarantee as a
  *    directly-built sketch (±1.65% normalized rank at k=200, 99%
  *    confidence), so per-partition sketches persisted in the lake
  *    answer any later percentile rollup from kilobytes.
  *  - Misra-Gries frequent items: "which tokens/domains/keys exceed x%
  *    of the stream" with a FIXED-size map per group and map-side
  *    combine. The sketch's NO_FALSE_NEGATIVES guarantee (every item
  *    with true count ≥ threshold is returned, with bounded
  *    over-estimate) makes it the candidate-generation half of EXACT
  *    two-pass heavy hitters: pass 1 finds a small guaranteed-superset,
  *    pass 2 counts exactly only those candidates
  *    ([[graft.analytics.Sketches.exactHeavyHitters]]).
  *
  * Both are TypedImperativeAggregates, so Catalyst gives partial
  * aggregation for free: sketch BYTES shuffle, never raw values. Mirrors
  * the reference's audit-and-aggregate needs
  * (`/root/reference/src/verify_dates.py`) at sizes where exact
  * per-grain recomputation is unaffordable.
  */
object NativeSketches {

  import org.apache.spark.sql.graftbridge.ColumnBridge

  // ------------------------------------------------------------- KLL
  /** graft_kll_agg(x, k): binary KLL(k) sketch of the group's non-null
    * doubles. Deterministic IN DISTRIBUTION only — KLL compaction flips
    * coins, so bytes differ run-to-run while rank error stays bounded. */
  case class KllAgg(
      child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[KllDoublesSketch]
      with ImplicitCastInputTypes {
    require(k >= 8 && k <= 65535, s"KLL k out of range: $k")

    override def inputTypes: Seq[DataType] = Seq(DoubleType)
    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType
    override def prettyName: String = "graft_kll_agg"

    override def createAggregationBuffer(): KllDoublesSketch =
      KllDoublesSketch.newHeapInstance(k)

    override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
      val v = child.eval(input)
      if (v != null) buf.update(v.asInstanceOf[Double])
      buf
    }

    override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
      buf.merge(other); buf
    }

    override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

    override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
    override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
      KllDoublesSketch.heapify(Memory.wrap(bytes))

    override def withNewMutableAggBufferOffset(o: Int): KllAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KllAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression = copy(child = c(0))
  }

  /** graft_kll_merge(sketch): union of already-built binary KLL sketches
    * — the rollup path. Reads kilobytes of sketch, never the raw data. */
  case class KllMergeAgg(
      child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[KllDoublesSketch]
      with ImplicitCastInputTypes {

    override def inputTypes: Seq[DataType] = Seq(BinaryType)
    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType
    override def prettyName: String = "graft_kll_merge"

    override def createAggregationBuffer(): KllDoublesSketch =
      KllDoublesSketch.newHeapInstance(k)

    override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
      val v = child.eval(input)
      if (v != null)
        buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
      buf
    }

    override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
      buf.merge(other); buf
    }

    override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

    override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
    override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
      KllDoublesSketch.heapify(Memory.wrap(bytes))

    override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression = copy(child = c(0))
  }

  /** graft_kll_quantiles(sketch, ranks): per-rank INCLUSIVE quantile
    * estimates from a binary KLL sketch (null/empty sketch → null). A
    * scalar over already-aggregated rows — one eval per GROUP, so
    * CodegenFallback costs nothing measurable. */
  case class KllQuantiles(sketch: Expression, ranks: Seq[Double])
      extends Expression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    require(ranks.nonEmpty && ranks.forall(r => r >= 0.0 && r <= 1.0),
      s"ranks must be in [0,1]: $ranks")

    override def children: Seq[Expression] = Seq(sketch)
    override def nullable: Boolean = true
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "graft_kll_quantiles"

    override def eval(input: InternalRow): Any = {
      val v = sketch.eval(input)
      if (v == null) return null
      val sk = KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]]))
      if (sk.isEmpty) return null
      val crit = org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE
      new GenericArrayData(ranks.map(r => sk.getQuantile(r, crit)).toArray)
    }

    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression = copy(sketch = c(0))
  }

  // ----------------------------------------------------- frequent items
  /** Misra-Gries candidate row: item, estimate, and the deterministic
    * bounds (true count ∈ [lb, ub] always). */
  val freqResultType: StructType = StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("ub", LongType, nullable = false)))

  /** graft_freq_candidates(item, maxMapSize, weightFrac): all items
    * whose count COULD be ≥ weightFrac * streamLength
    * (NO_FALSE_NEGATIVES: a superset of the true heavy hitters, by the
    * sketch's deterministic error bound), ordered by estimate DESC then
    * item. maxMapSize (power of 2) caps state at ~m entries per
    * partial buffer regardless of cardinality. */
  case class FreqCandidates(
      child: Expression, maxMapSize: Int, weightFrac: Double,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[ItemsSketch[String]]
      with ImplicitCastInputTypes {
    require(maxMapSize >= 8 && Integer.bitCount(maxMapSize) == 1,
      s"maxMapSize must be a power of 2 >= 8: $maxMapSize")
    require(weightFrac > 0.0 && weightFrac < 1.0,
      s"weightFrac must be in (0,1): $weightFrac")

    @transient private lazy val serde = new ArrayOfStringsSerDe

    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(freqResultType, containsNull = false)
    override def prettyName: String = "graft_freq_candidates"

    override def createAggregationBuffer(): ItemsSketch[String] =
      new ItemsSketch[String](maxMapSize)

    override def update(buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
      val v = child.eval(input)
      if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
      buf
    }

    override def merge(buf: ItemsSketch[String], other: ItemsSketch[String]): ItemsSketch[String] =
      buf.merge(other)

    override def eval(buf: ItemsSketch[String]): Any = {
      val threshold = math.ceil(weightFrac * buf.getStreamLength).toLong
      // The superset guarantee only holds when the threshold clears the
      // sketch's tracked error (an evicted item can hide at most
      // maxError counts) — an undersized map must fail LOUDLY, not
      // silently drop borderline heavy hitters. maxError ≤ ~3.5·n/m, so
      // any maxMapSize ≥ 4/weightFrac is safe at every stream length.
      if (buf.getMaximumError > threshold)
        throw new IllegalStateException(
          s"graft_freq_candidates: maxMapSize=$maxMapSize is too small for " +
            s"weightFrac=$weightFrac at n=${buf.getStreamLength} (tracked " +
            s"error ${buf.getMaximumError} > threshold $threshold) — the " +
            "candidate set could miss true heavy hitters; raise maxMapSize")
      val rows = buf.getFrequentItems(threshold, ErrorType.NO_FALSE_NEGATIVES)
        .sortBy(r => (-r.getEstimate, r.getItem))
      new GenericArrayData(rows.map { r =>
        InternalRow(UTF8String.fromString(r.getItem),
          r.getEstimate, r.getLowerBound, r.getUpperBound): Any
      })
    }

    override def serialize(buf: ItemsSketch[String]): Array[Byte] =
      buf.toByteArray(serde)
    override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
      ItemsSketch.getInstance(Memory.wrap(bytes), serde)

    override def withNewMutableAggBufferOffset(o: Int): FreqCandidates =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): FreqCandidates =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression = copy(child = c(0))
  }

  // -------------------------------------------------------------- theta
  /** graft_theta_agg(x, lgK): binary compact theta sketch of the group's
    * distinct non-null values. The theta family is the DISTINCT-SET
    * algebra HLL lacks: compact sketches intersect and difference, not
    * just union, so "how many of yesterday's users returned today" is
    * sketch-sized set math instead of a distinct-join. Below 2^lgK
    * distinct values the sketch is in EXACT mode (deterministic integer
    * answers — q147 rides that under a DuckDB oracle); above, estimates
    * carry the configured relative standard error. */
  case class ThetaAgg(
      child: Expression, lgK: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[org.apache.datasketches.theta.Union]
      with ImplicitCastInputTypes {
    require(lgK >= 4 && lgK <= 26, s"theta lgK out of range: $lgK")

    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType
    override def prettyName: String = "graft_theta_agg"

    private def newUnion(): org.apache.datasketches.theta.Union =
      org.apache.datasketches.theta.SetOperation.builder()
        .setLogNominalEntries(lgK).buildUnion()

    override def createAggregationBuffer(): org.apache.datasketches.theta.Union =
      newUnion()

    override def update(buf: org.apache.datasketches.theta.Union,
        input: InternalRow): org.apache.datasketches.theta.Union = {
      val v = child.eval(input)
      if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
      buf
    }

    override def merge(buf: org.apache.datasketches.theta.Union,
        other: org.apache.datasketches.theta.Union): org.apache.datasketches.theta.Union = {
      buf.union(other.getResult); buf
    }

    override def eval(buf: org.apache.datasketches.theta.Union): Any =
      buf.getResult.toByteArray

    override def serialize(buf: org.apache.datasketches.theta.Union): Array[Byte] =
      buf.getResult.toByteArray
    override def deserialize(bytes: Array[Byte]): org.apache.datasketches.theta.Union = {
      val u = newUnion()
      u.union(Memory.wrap(bytes))
      u
    }

    override def withNewMutableAggBufferOffset(o: Int): ThetaAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): ThetaAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression = copy(child = c(0))
  }

  /** graft_theta_union(sketch, lgK): union of already-built binary theta
    * sketches — the rollup path. */
  case class ThetaUnionAgg(
      child: Expression, lgK: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[org.apache.datasketches.theta.Union]
      with ImplicitCastInputTypes {

    override def inputTypes: Seq[DataType] = Seq(BinaryType)
    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType
    override def prettyName: String = "graft_theta_union"

    private def newUnion(): org.apache.datasketches.theta.Union =
      org.apache.datasketches.theta.SetOperation.builder()
        .setLogNominalEntries(lgK).buildUnion()

    override def createAggregationBuffer(): org.apache.datasketches.theta.Union =
      newUnion()

    override def update(buf: org.apache.datasketches.theta.Union,
        input: InternalRow): org.apache.datasketches.theta.Union = {
      val v = child.eval(input)
      if (v != null) buf.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
      buf
    }

    override def merge(buf: org.apache.datasketches.theta.Union,
        other: org.apache.datasketches.theta.Union): org.apache.datasketches.theta.Union = {
      buf.union(other.getResult); buf
    }

    override def eval(buf: org.apache.datasketches.theta.Union): Any =
      buf.getResult.toByteArray

    override def serialize(buf: org.apache.datasketches.theta.Union): Array[Byte] =
      buf.getResult.toByteArray
    override def deserialize(bytes: Array[Byte]): org.apache.datasketches.theta.Union = {
      val u = newUnion()
      u.union(Memory.wrap(bytes))
      u
    }

    override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression = copy(child = c(0))
  }

  /** graft_theta_setop(a, b, op): binary theta set operation over two
    * compact sketches — 'union' | 'intersect' | 'anotb'. Null if either
    * side is null. Scalar over aggregated rows → CodegenFallback. */
  case class ThetaSetOp(left: Expression, right: Expression, op: String)
      extends Expression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    require(Seq("union", "intersect", "anotb").contains(op), s"bad op: $op")

    override def children: Seq[Expression] = Seq(left, right)
    override def nullable: Boolean = true
    override def dataType: DataType = BinaryType
    override def prettyName: String = s"graft_theta_$op"

    override def eval(input: InternalRow): Any = {
      val l = left.eval(input)
      val r = right.eval(input)
      if (l == null || r == null) return null
      import org.apache.datasketches.theta.{SetOperation, Sketches => TS}
      val a = TS.heapifyCompactSketch(Memory.wrap(l.asInstanceOf[Array[Byte]]))
      val b = TS.heapifyCompactSketch(Memory.wrap(r.asInstanceOf[Array[Byte]]))
      val out = op match {
        case "union" =>
          val u = SetOperation.builder().buildUnion()
          u.union(a); u.union(b); u.getResult
        case "intersect" =>
          val i = SetOperation.builder().buildIntersection()
          i.intersect(a); i.intersect(b); i.getResult
        case "anotb" =>
          val d = SetOperation.builder().buildANotB()
          d.setA(a); d.notB(b); d.getResult(true)
      }
      out.toByteArray
    }

    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression = copy(left = c(0), right = c(1))
  }

  /** graft_theta_estimate(sketch): distinct-count estimate of a binary
    * theta sketch (exact when the sketch never left exact mode). */
  case class ThetaEstimate(child: Expression)
      extends Expression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = true
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_theta_estimate"

    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) return null
      org.apache.datasketches.theta.Sketches
        .heapifyCompactSketch(Memory.wrap(v.asInstanceOf[Array[Byte]]))
        .getEstimate
    }

    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression = copy(child = c(0))
  }

  // ------------------------------------------------------------ Columns
  /** Aggregate Column: binary KLL(k) sketch of `x` (cast to double). */
  def kllAgg(x: Column, k: Int = 200): Column =
    ColumnBridge.column(
      KllAgg(ColumnBridge.expression(x.cast("double")), k).toAggregateExpression())

  /** Aggregate Column: union of binary KLL sketches (rollup). */
  def kllMerge(sketch: Column, k: Int = 200): Column =
    ColumnBridge.column(
      KllMergeAgg(ColumnBridge.expression(sketch), k).toAggregateExpression())

  /** Scalar Column: INCLUSIVE quantile estimates at `ranks` from a
    * binary KLL sketch, as array<double> (null for an empty sketch). */
  def kllQuantiles(sketch: Column, ranks: Seq[Double]): Column =
    ColumnBridge.column(KllQuantiles(ColumnBridge.expression(sketch), ranks))

  /** Aggregate Column: heavy-hitter CANDIDATES of the string column —
    * every item possibly ≥ weightFrac of the group's rows, with
    * deterministic count bounds. */
  def freqCandidates(item: Column, maxMapSize: Int, weightFrac: Double): Column =
    ColumnBridge.column(
      FreqCandidates(ColumnBridge.expression(item), maxMapSize, weightFrac)
        .toAggregateExpression())

  /** Aggregate Column: binary theta sketch of `x`'s distinct values
    * (cast to string). */
  def thetaAgg(x: Column, lgK: Int = 12): Column =
    ColumnBridge.column(
      ThetaAgg(ColumnBridge.expression(x.cast("string")), lgK)
        .toAggregateExpression())

  /** Aggregate Column: union of binary theta sketches (rollup). */
  def thetaUnionAgg(sketch: Column, lgK: Int = 12): Column =
    ColumnBridge.column(
      ThetaUnionAgg(ColumnBridge.expression(sketch), lgK)
        .toAggregateExpression())

  // ------------------------------------------------- SQL registrations
  private def litNum(e: Expression, what: String): Double = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Number, _) =>
      v.doubleValue()
    case org.apache.spark.sql.catalyst.expressions.Literal(d: Decimal, _) =>
      d.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  /** SQL builders for the sketch family — registered by GraftExtensions
    * and NativeHashes.register so `spark.sql` sessions get the same
    * surface as the Column API. Size/rank arguments must be literals
    * (they parameterize the aggregate itself). */
  private[functions] val sqlBuilders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_kll_agg" -> { exprs =>
      KllAgg(exprs.head,
        if (exprs.size > 1) litNum(exprs(1), "k").toInt else 200)
        .asInstanceOf[Expression]
    },
    "graft_kll_merge" -> { exprs =>
      KllMergeAgg(exprs.head,
        if (exprs.size > 1) litNum(exprs(1), "k").toInt else 200)
    },
    "graft_kll_quantiles" -> { exprs =>
      KllQuantiles(exprs.head,
        exprs.tail.map(litNum(_, "rank")))
    },
    "graft_freq_candidates" -> { exprs =>
      FreqCandidates(exprs.head, litNum(exprs(1), "maxMapSize").toInt,
        litNum(exprs(2), "weightFrac"))
    },
    "graft_theta_agg" -> { exprs =>
      ThetaAgg(exprs.head,
        if (exprs.size > 1) litNum(exprs(1), "lgK").toInt else 12)
    },
    "graft_theta_union_agg" -> { exprs =>
      ThetaUnionAgg(exprs.head,
        if (exprs.size > 1) litNum(exprs(1), "lgK").toInt else 12)
    },
    "graft_theta_union" -> (exprs => ThetaSetOp(exprs(0), exprs(1), "union")),
    "graft_theta_intersect" -> (exprs => ThetaSetOp(exprs(0), exprs(1), "intersect")),
    "graft_theta_diff" -> (exprs => ThetaSetOp(exprs(0), exprs(1), "anotb")),
    "graft_theta_estimate" -> (exprs => ThetaEstimate(exprs.head)))

  /** Scalar Columns: theta set algebra over binary sketches. */
  def thetaUnion(a: Column, b: Column): Column =
    ColumnBridge.column(ThetaSetOp(
      ColumnBridge.expression(a), ColumnBridge.expression(b), "union"))
  def thetaIntersect(a: Column, b: Column): Column =
    ColumnBridge.column(ThetaSetOp(
      ColumnBridge.expression(a), ColumnBridge.expression(b), "intersect"))
  def thetaDiff(a: Column, b: Column): Column =
    ColumnBridge.column(ThetaSetOp(
      ColumnBridge.expression(a), ColumnBridge.expression(b), "anotb"))
  def thetaEstimate(sketch: Column): Column =
    ColumnBridge.column(ThetaEstimate(ColumnBridge.expression(sketch)))
}
