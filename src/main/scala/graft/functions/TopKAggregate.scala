package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keep the `k` GREATEST values of a struct
  * column per group (natural struct ordering — field-by-field
  * lexicographic, so pass `struct(orderCol, tieCol, payload…)` and put a
  * unique tie column second for a fully deterministic result). Output:
  * the kept structs as an array, sorted DESCENDING.
  *
  * Why a native `TypedImperativeAggregate` instead of a window: window
  * top-k (`row_number over (partition by g order by v) <= k`) must
  * SHUFFLE AND SORT EVERY ROW — the whole corpus crosses the wire to be
  * mostly discarded. This aggregate keeps a k-bounded min-heap per group
  * per partition, so partial (map-side) aggregation reduces each
  * partition to ≤ k rows per group BEFORE the exchange: shuffled volume
  * is O(groups · k · partitions) worst case instead of O(rows), and no
  * sort of data ever happens (the final per-group sort is over k
  * elements). At 100 TB that is the difference between a full-corpus
  * sort-shuffle and a scan.
  *
  * Buffer: a min-heap (java.util.PriorityQueue) of copied InternalRows —
  * peek = the smallest kept value, so the common "row below the current
  * k-floor" case is one comparison and no mutation. Spill-safe
  * serialization via UnsafeProjection bytes (the Percentile pattern).
  */
case class BoundedTopK(child: Expression, k: Int,
                       reverse: Boolean = false,
                       reversedFields: Seq[Int] = Nil,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[InternalRow]] {

  require(k >= 1, s"bounded_top_k: k must be >= 1, got $k")

  private lazy val structType = child.dataType.asInstanceOf[StructType]

  /** `reverse = true` keeps the k SMALLEST instead (bottom-k), output
    * ascending — the identical heap machinery under a flipped ordering.
    * `reversedFields` flips individual struct fields inside the
    * comparison (field indexes, 0-based): "greatest" then means e.g.
    * (score MAX, token MIN) — the mixed-direction rank windows express
    * with `ORDER BY a DESC, b ASC`, for field types (strings) that
    * cannot ride a negated copy. Composable with `reverse`.
    */
  @transient private lazy val ordering: Ordering[Any] = {
    val base: Ordering[Any] =
      if (reversedFields.isEmpty) TypeUtils.getInterpretedOrdering(child.dataType)
      else {
        val fields = structType.fields
        require(reversedFields.forall(i => i >= 0 && i < fields.length),
          s"bounded_top_k: reversedFields out of range for ${fields.length} fields")
        val fieldOrds: Array[Ordering[Any]] =
          fields.map(f => TypeUtils.getInterpretedOrdering(f.dataType))
        val flip: Array[Boolean] = Array.tabulate(fields.length)(reversedFields.contains)
        val dts = fields.map(_.dataType)
        new Ordering[Any] {
          override def compare(x: Any, y: Any): Int = {
            val a = x.asInstanceOf[InternalRow]; val b = y.asInstanceOf[InternalRow]
            var i = 0
            while (i < fieldOrds.length) {
              val av = a.get(i, dts(i)); val bv = b.get(i, dts(i))
              val c =
                if (av == null && bv == null) 0
                else if (av == null) -1 // nulls least, like the natural struct order
                else if (bv == null) 1
                else fieldOrds(i).compare(av, bv)
              if (c != 0) return if (flip(i)) -c else c
              i += 1
            }
            0
          }
        }
      }
    if (reverse) base.reverse else base
  }
  @transient private lazy val rowOrdering: java.util.Comparator[InternalRow] =
    (a: InternalRow, b: InternalRow) => ordering.compare(a, b)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case s: StructType if org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(s) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bounded_top_k needs an orderable struct input, got ${other.simpleString(5)}")
    }

  override def createAggregationBuffer(): java.util.PriorityQueue[InternalRow] =
    new java.util.PriorityQueue[InternalRow](k + 1, rowOrdering)

  /** Codegen'd projection for the per-row child eval: a
    * TypedImperativeAggregate never enters whole-stage codegen, so the
    * r11 `child.eval(input)` paid interpreted struct construction on
    * EVERY corpus row — the dominant per-row cost once the heap is warm
    * (the common case is one comparison and no mutation). A reused
    * UnsafeProjection generates that struct with compiled code; only
    * rows that are actually KEPT get copied out of the projection's
    * reused buffer.
    */
  @transient private lazy val inputProj = UnsafeProjection.create(Seq(child))

  override def update(buf: java.util.PriorityQueue[InternalRow],
                      input: InternalRow): java.util.PriorityQueue[InternalRow] = {
    val projected = inputProj(input)
    if (!projected.isNullAt(0)) {
      val row = projected.getStruct(0, structType.length)
      if (buf.size() < k) buf.offer(row.copy())
      else if (ordering.compare(row, buf.peek()) > 0) {
        buf.poll(); buf.offer(row.copy())
      }
    }
    buf
  }

  override def merge(buf: java.util.PriorityQueue[InternalRow],
                     other: java.util.PriorityQueue[InternalRow]): java.util.PriorityQueue[InternalRow] = {
    val it = other.iterator()
    while (it.hasNext) {
      val row = it.next()
      if (buf.size() < k) buf.offer(row)
      else if (ordering.compare(row, buf.peek()) > 0) {
        buf.poll(); buf.offer(row)
      }
    }
    buf
  }

  override def eval(buf: java.util.PriorityQueue[InternalRow]): Any = {
    val arr = new Array[InternalRow](buf.size())
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr, rowOrdering.reversed())
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  @transient private lazy val proj = UnsafeProjection.create(Array(child.dataType))

  override def serialize(buf: java.util.PriorityQueue[InternalRow]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) {
      val u = proj(InternalRow(it.next()))
      val bytes = u.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[InternalRow] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val q = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val u = new UnsafeRow(1)
      u.pointTo(rowBytes, len)
      q.offer(u.getStruct(0, structType.length).copy())
      i += 1
    }
    q
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "bounded_top_k"
}
