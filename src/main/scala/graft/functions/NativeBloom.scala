package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{
  BinaryType, BooleanType, ByteType, DataType, IntegerType, LongType,
  ShortType, StringType}
import org.apache.spark.util.sketch.BloomFilter
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Per-group Bloom filters as a first-class aggregate, built on the
  * `org.apache.spark.util.sketch.BloomFilter` Spark already ships for its
  * runtime row-level filters.
  *
  * Why the engine needs them: zone maps ([[graft.sources.DataSkipping]])
  * prune range predicates on CLUSTERED columns — min/max intervals are
  * only selective when the layout sorts by the column. A point lookup on
  * any other column ("this customer's orders", "this document id") hits
  * every file's [min,max] and zone maps prune nothing. A per-file Bloom
  * filter answers "does this file possibly contain v?" in O(1) with no
  * layout assumption at all — the membership analog of the reference's
  * Postgres index probe (`/root/reference/database/schema.sql:31-33`),
  * re-expressed for an immutable lake. False positives only cost an extra
  * file read; a negative is definitive, so pruning can never drop a row.
  *
  * Both sides hash the VALUE the same way (integral → putLong/
  * mightContainLong; string/binary → the UTF-8 bytes), so agg and probe
  * agree by construction. Sizing: `expectedItems` at the builder's chosen
  * per-file row bound and fpp=3% costs ~7.3 bits/item (~0.9 MB per 10⁶
  * rows) — manifest-plane weight, amortized over every lookup.
  *
  * [[BloomAgg]] is a TypedImperativeAggregate, so Catalyst gives map-side
  * partial merge; [[BloomMightContain]] is a scalar over MANIFEST rows
  * (one per file), so its CodegenFallback eval and memoized deserialize
  * cost nothing measurable.
  */
object NativeBloom {

  private def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case StringType | BinaryType => true
    case _ => false
  }

  private def put(bf: BloomFilter, dt: DataType, v: Any): Unit = dt match {
    case ByteType => bf.putLong(v.asInstanceOf[Byte].toLong)
    case ShortType => bf.putLong(v.asInstanceOf[Short].toLong)
    case IntegerType => bf.putLong(v.asInstanceOf[Int].toLong)
    case LongType => bf.putLong(v.asInstanceOf[Long])
    case StringType => bf.putBinary(v.asInstanceOf[UTF8String].getBytes)
    case BinaryType => bf.putBinary(v.asInstanceOf[Array[Byte]])
    case other => throw new IllegalArgumentException(s"bloom: $other")
  }

  private def contains(bf: BloomFilter, dt: DataType, v: Any): Boolean = dt match {
    case ByteType => bf.mightContainLong(v.asInstanceOf[Byte].toLong)
    case ShortType => bf.mightContainLong(v.asInstanceOf[Short].toLong)
    case IntegerType => bf.mightContainLong(v.asInstanceOf[Int].toLong)
    case LongType => bf.mightContainLong(v.asInstanceOf[Long])
    case StringType => bf.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
    case BinaryType => bf.mightContainBinary(v.asInstanceOf[Array[Byte]])
    case other => throw new IllegalArgumentException(s"bloom: $other")
  }

  private def toBytes(bf: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  private def fromBytes(b: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(b))

  /** Deserialize a committed filter blob for DRIVER-side probing (the
    * manifest-probe cache in [[graft.sources.CommitLog]]). Reads on the
    * returned filter are thread-safe (pure bit-array lookups). */
  def readFilter(b: Array[Byte]): BloomFilter = fromBytes(b)

  /** Driver-side twin of [[BloomMightContain]] over EXTERNAL JVM types
    * (collected rows carry String/Long, not UTF8String). Must hash
    * exactly like [[put]]: strings probe their UTF-8 bytes. */
  def mightContainValue(bf: BloomFilter, v: Any): Boolean = v match {
    case s: String =>
      bf.mightContainBinary(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    case b: Array[Byte] => bf.mightContainBinary(b)
    case l: Long => bf.mightContainLong(l)
    case i: Int => bf.mightContainLong(i.toLong)
    case s: Short => bf.mightContainLong(s.toLong)
    case b: Byte => bf.mightContainLong(b.toLong)
    case other => throw new IllegalArgumentException(
      s"bloom probe: unsupported value ${if (other == null) "null" else other.getClass}")
  }

  /** graft_bloom_agg(x, expectedItems, fpp): binary Bloom filter over the
    * group's non-null values. Nulls are not inserted — a Bloom filter
    * answers value membership; null presence is the zone-map `nulls_c`
    * stat's job. */
  case class BloomAgg(
      child: Expression, expectedItems: Long, fpp: Double,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[BloomFilter] {
    require(expectedItems > 0, s"expectedItems must be positive: $expectedItems")
    require(fpp > 0.0 && fpp < 1.0, s"fpp out of (0,1): $fpp")

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType
    override def prettyName: String = "graft_bloom_agg"
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (supported(child.dataType))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom supports integral/string/binary, got ${child.dataType}")

    override def createAggregationBuffer(): BloomFilter =
      BloomFilter.create(expectedItems, fpp)

    override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
      val v = child.eval(input)
      if (v != null) put(buf, child.dataType, v)
      buf
    }

    override def merge(buf: BloomFilter, other: BloomFilter): BloomFilter = {
      buf.mergeInPlace(other); buf
    }

    override def eval(buf: BloomFilter): Any = toBytes(buf)
    override def serialize(buf: BloomFilter): Array[Byte] = toBytes(buf)
    override def deserialize(bytes: Array[Byte]): BloomFilter = fromBytes(bytes)

    override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): BloomAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression = copy(child = c(0))
  }

  /** graft_bloom_contains(bloom, v): true iff the filter POSSIBLY
    * contains v (false is definitive). Null bloom or null probe → null.
    * Deserialization is memoized per filter byte-array (reference
    * identity): a manifest probe evaluates one filter per file row, and
    * a broadcast probe evaluates ONE filter for millions of rows. */
  case class BloomMightContain(bloom: Expression, value: Expression)
      extends Expression with CodegenFallback {

    override def children: Seq[Expression] = Seq(bloom, value)
    override def nullable: Boolean = true
    override def dataType: DataType = BooleanType
    override def prettyName: String = "graft_bloom_contains"
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (bloom.dataType == BinaryType && supported(value.dataType))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expected (binary, integral/string/binary), got " +
          s"(${bloom.dataType}, ${value.dataType})")

    @transient private var lastBytes: Array[Byte] = _
    @transient private var lastFilter: BloomFilter = _

    override def eval(input: InternalRow): Any = {
      val b = bloom.eval(input)
      val v = value.eval(input)
      if (b == null || v == null) return null
      val bytes = b.asInstanceOf[Array[Byte]]
      if (!(bytes eq lastBytes)) {
        lastFilter = fromBytes(bytes)
        lastBytes = bytes
      }
      contains(lastFilter, value.dataType, v)
    }

    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression =
      copy(bloom = c(0), value = c(1))
  }

  // ------------------------------------------------------------ Columns
  /** Aggregate Column: binary Bloom filter of the group's non-null
    * values. */
  def bloomAgg(x: Column, expectedItems: Long, fpp: Double = 0.03): Column =
    ColumnBridge.column(
      BloomAgg(ColumnBridge.expression(x), expectedItems, fpp)
        .toAggregateExpression())

  /** Scalar Column: possible-membership probe against a binary filter. */
  def bloomMightContain(bloom: Column, v: Column): Column =
    ColumnBridge.column(BloomMightContain(
      ColumnBridge.expression(bloom), ColumnBridge.expression(v)))
}
