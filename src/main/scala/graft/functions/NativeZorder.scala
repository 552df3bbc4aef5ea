package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{
  Coalesce, CreateArray, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Z-order (Morton) interleaving for multi-dimensional clustering.
  *
  * [[graft.sources.CommitLog.compactClustered]] range-sorts
  * lexicographically, so its zone maps prune the LEADING cluster column
  * sharply and the trailing ones barely: every file spans the full
  * range of column 2 within its column-1 slice. Z-ordering interleaves
  * the columns' bits MSB-first instead, so sorting by the single
  * interleaved key makes every file cover a small HYPER-RECTANGLE of
  * the value space — the per-file `min/max` stats that already ride the
  * commit then prune a predicate on ANY clustered column, not just the
  * first — the standard lakehouse multi-column clustering design
  * (Morton's 1966 space-filling curve, as applied by the open
  * lakehouse formats' OPTIMIZE ZORDER).
  *
  * Per-dimension encoding is ORDER-PRESERVING into an
  * unsigned-comparable 64-bit word (the bit extraction compares
  * MSB-first, i.e. as unsigned):
  *  - integral types / dates / timestamps: `x ^ Long.MIN_VALUE`
  *  - floating point: IEEE sortable-bits transform (positives get the
  *    sign bit set, negatives bit-flip), total-ordered
  *  - strings: first 8 UTF-8 bytes big-endian (prefix-order-preserving —
  *    exactly the grain a zone map can use for strings)
  *  - null: encodes to 0, sorting first — the NULLS FIRST contract
  *
  * The interleave takes ALL 64 bits of every dimension into an
  * `n*8`-byte BINARY key whose unsigned-lexicographic sort order is the
  * Z-curve order — `repartitionByRange` + `sortWithinPartitions` on it
  * need no custom comparator, and narrow-range columns (whose live
  * values share long constant high-bit runs) degrade to a constant key
  * prefix instead of a degenerate key. One pass per row — no quantile
  * model, no per-column global sort. Both expressions live inside
  * whole-stage codegen.
  *
  * Generalizes [[graft.ops.GeoOps.zorderKey]] — the 2×16-bit grid-cell
  * interleave the geo operators cluster by — to N dimensions of any
  * stats-bearing type at full width.
  */
object NativeZorder {

  /** Signed long → unsigned-comparable bits. */
  def encodeLong(x: Long): Long = x ^ Long.MinValue

  /** Double → unsigned-comparable bits (IEEE total order). */
  def encodeDouble(d: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(d)
    if (b >= 0) b ^ Long.MinValue else ~b
  }

  /** UTF-8 prefix (first 8 bytes, big-endian) → unsigned-comparable. */
  def encodeUtf8(s: UTF8String): Long = {
    val bytes = s.getBytes
    var u = 0L
    var i = 0
    while (i < 8) {
      u = (u << 8) | (if (i < bytes.length) bytes(i) & 0xffL else 0L)
      i += 1
    }
    u
  }

  /** MSB-first round-robin interleave of ALL 64 bits of each word into
    * an `n*8`-byte key; binary sort order (unsigned lexicographic) is
    * then the Z-curve order. Interleaving the FULL width — not a
    * truncated long — is what makes the key range-agnostic: columns
    * whose live values span a narrow slice of the type (ids, small
    * ints, enum-ish strings) contribute long constant high-bit runs
    * that become a constant key prefix, and the sort is driven by the
    * data bits wherever they sit. */
  def interleaveArray(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val out = new Array[Byte](n * 8)
    var bitOut = 0
    var i = 0
    while (i < 64) {
      var j = 0
      while (j < n) {
        val bit = ((a.getLong(j) >>> (63 - i)) & 1L).toInt
        out(bitOut >>> 3) =
          (out(bitOut >>> 3) | (bit << (7 - (bitOut & 7)))).toByte
        bitOut += 1
        j += 1
      }
      i += 1
    }
    out
  }

  /** Order-preserving encode of one dimension into unsigned-comparable
    * bits; null in → null out (the builder coalesces to 0 = first). */
  case class SortableBitsExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_sortable_bits"

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType | IntegerType | ShortType | ByteType | DateType |
          TimestampType | TimestampNTZType | DoubleType | FloatType |
          StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_zorder does not order ${other.simpleString} columns")
    }

    override protected def nullSafeEval(v: Any): Any = child.dataType match {
      case LongType | TimestampType | TimestampNTZType =>
        encodeLong(v.asInstanceOf[Long])
      case IntegerType | DateType => encodeLong(v.asInstanceOf[Int].toLong)
      case ShortType => encodeLong(v.asInstanceOf[Short].toLong)
      case ByteType => encodeLong(v.asInstanceOf[Byte].toLong)
      case DoubleType => encodeDouble(v.asInstanceOf[Double])
      case FloatType => encodeDouble(v.asInstanceOf[Float].toDouble)
      case StringType => encodeUtf8(v.asInstanceOf[UTF8String])
      case other => throw new IllegalStateException(
        s"graft_zorder: unreachable type $other")
    }

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val z = "graft.functions.NativeZorder"
      val call: String => String = child.dataType match {
        case LongType | TimestampType | TimestampNTZType =>
          c => s"$z.encodeLong($c)"
        case IntegerType | DateType | ShortType | ByteType =>
          c => s"$z.encodeLong((long)($c))"
        case DoubleType => c => s"$z.encodeDouble($c)"
        case FloatType => c => s"$z.encodeDouble((double)($c))"
        case StringType => c => s"$z.encodeUtf8($c)"
        case other => throw new IllegalStateException(
          s"graft_zorder: unreachable type $other")
      }
      defineCodeGen(ctx, ev, call)
    }

    override protected def withNewChildInternal(
        newChild: Expression): SortableBitsExpr = copy(child = newChild)
  }

  /** Interleave an array<bigint> of encoded dimensions into the Z key. */
  case class InterleaveExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "graft_zorder"

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_zorder interleave needs array<bigint>, got ${other.simpleString}")
    }

    override protected def nullSafeEval(v: Any): Any =
      interleaveArray(v.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.NativeZorder.interleaveArray($c)")

    override protected def withNewChildInternal(
        newChild: Expression): InterleaveExpr = copy(child = newChild)
  }

  /** Expression builder shared by the Column wrapper and the SQL
    * registration: encode each dimension (null → 0 = sorts first),
    * interleave. */
  def zorderExpr(dims: Seq[Expression]): Expression = {
    require(dims.size >= 2 && dims.size <= 8,
      s"graft_zorder takes 2..8 columns, got ${dims.size}")
    InterleaveExpr(CreateArray(dims.map(d =>
      Coalesce(Seq(SortableBitsExpr(d), Literal(0L))))))
  }

  /** Column wrapper: the Z-order clustering key of the given columns. */
  def zorder(cols: Column*): Column =
    ColumnBridge.column(
      zorderExpr(cols.map(ColumnBridge.catalystExpression)))
}
