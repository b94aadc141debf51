package graft.plans

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Bounded top-k buffer: the k best (score DESC, tiebreak ASC) struct rows
  * seen so far, held in a size-k binary heap whose root is the WORST kept
  * element — so admission is one comparison against the root and the
  * buffer can never exceed k rows regardless of group size. */
final class TopKBuffer(val k: Int) {
  // rank order: negative ⇔ a ranks strictly before b
  private def cmpRank(sa: Double, ta: Long, sb: Double, tb: Long): Int = {
    val c = java.lang.Double.compare(sb, sa) // score DESC
    if (c != 0) c else java.lang.Long.compare(ta, tb) // tiebreak ASC
  }
  // heap root = LAST-ranked kept element (reverse rank order)
  private val heap = new java.util.PriorityQueue[(Double, Long, UnsafeRow)](
    math.max(k, 1),
    (a: (Double, Long, UnsafeRow), b: (Double, Long, UnsafeRow)) =>
      cmpRank(b._1, b._2, a._1, a._2))

  def add(score: Double, tie: Long, row: UnsafeRow): Unit = {
    if (heap.size < k) heap.offer((score, tie, row))
    else {
      val worst = heap.peek()
      if (cmpRank(score, tie, worst._1, worst._2) < 0) {
        heap.poll(); heap.offer((score, tie, row))
      }
    }
  }

  def mergeFrom(other: TopKBuffer): Unit =
    other.heap.forEach(e => add(e._1, e._2, e._3))

  /** Kept rows in rank order (best first). */
  def sorted: Array[UnsafeRow] = {
    val arr = new Array[(Double, Long, UnsafeRow)](heap.size)
    heap.toArray(arr)
    java.util.Arrays.sort(arr,
      (a: (Double, Long, UnsafeRow), b: (Double, Long, UnsafeRow)) =>
        cmpRank(a._1, a._2, b._1, b._2))
    arr.map(_._3)
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(heap.size)
    heap.forEach { e =>
      out.writeDouble(e._1); out.writeLong(e._2)
      val bytes = e._3.getBytes
      out.writeInt(bytes.length); out.write(bytes)
    }
    out.flush(); bos.toByteArray
  }
}

object TopKBuffer {
  def deserialize(bytes: Array[Byte], k: Int,
                  rowType: StructType): TopKBuffer = {
    val buf = new TopKBuffer(k)
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    var i = 0
    while (i < n) {
      val score = in.getDouble; val tie = in.getLong
      val len = in.getInt
      val rowBytes = new Array[Byte](len); in.get(rowBytes)
      val row = new UnsafeRow(rowType.length)
      row.pointTo(rowBytes, len)
      buf.add(score, tie, row)
      i += 1
    }
    buf
  }
}

/** `top_k_by_score(struct, k)` — mergeable native top-k-per-group: keeps
  * the k best input structs by (field0: double DESC, field1: long ASC) in
  * a bounded heap, with MAP-SIDE PARTIAL aggregation (ObjectHashAggregate
  * plans partial_top_k_by_score before the group exchange), so the
  * shuffle moves at most k rows per (group, input partition) and NO
  * per-group sort ever runs over the full candidate set. This is the
  * 100 TB shape for ranked neighbour lists: the WindowGroupLimit form
  * still sorts each partition's rows; the heap admits each row in O(log
  * k) against the current worst. Returns array<struct> in rank order —
  * posexplode to recover (rank, row).
  *
  * Contract: input struct's field 0 is the DOUBLE score (ranked DESC),
  * field 1 the LONG tiebreak (ranked ASC, unique within a group for a
  * deterministic total order); remaining fields are carried payload.
  * Null structs and null score/tiebreak fields are skipped. */
case class TopKByScore(child: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] with UnaryLike[Expression] {
  require(k >= 1, "k must be >= 1")

  private lazy val rowType = child.dataType.asInstanceOf[StructType]
  require(child.dataType.isInstanceOf[StructType] &&
    rowType.length >= 2 &&
    rowType(0).dataType == DoubleType && rowType(1).dataType == LongType,
    "top_k_by_score needs struct(score double, tiebreak long, payload...)")

  @transient private lazy val toUnsafe =
    UnsafeProjection.create(rowType.fields.map(_.dataType))

  override def createAggregationBuffer(): TopKBuffer =
    new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1)) {
        // copy through an UnsafeProjection: eval may return a reused row
        val unsafe = row match {
          case u: UnsafeRow => u.copy()
          case other => toUnsafe(other).copy()
        }
        buf.add(unsafe.getDouble(0), unsafe.getLong(1), unsafe)
      }
    }
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    a.mergeFrom(b); a
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted.asInstanceOf[Array[Any]])

  override def serialize(buf: TopKBuffer): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): TopKBuffer =
    TopKBuffer.deserialize(bytes, k, rowType)

  override def dataType: DataType =
    ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by_score"
  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): TopKByScore =
    copy(child = c)
}

object TopK {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "top_k_by_score",
      { exprs =>
        // analysis-time contract checks: SQL misuse fails with a named
        // AnalysisException, not an opaque ClassCastException/NPE during
        // planning
        if (exprs.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            Map("functionName" -> "`top_k_by_score`",
              "expectedNum" -> "2",
              "actualNum" -> exprs.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        val kExpr = exprs(1)
        val kVal = if (kExpr.foldable) kExpr.eval() else null
        kVal match {
          case n: Number =>
            TopKByScore(exprs.head, n.intValue()).toAggregateExpression()
          case _ =>
            throw new org.apache.spark.sql.AnalysisException(
              "INVALID_PARAMETER_VALUE.INTEGER",
              Map("parameter" -> "`k`",
                "functionName" -> "`top_k_by_score`",
                "invalidValue" -> kExpr.sql))
        }
      },
      "built-in")

  def top_k_by_score(structCol: Column, k: Int): Column =
    call_function("top_k_by_score", structCol, lit(k))
}
