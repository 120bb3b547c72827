package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k-by-score aggregation state: at most k (score, id) entries
  * kept in rank order. The mergeable-summary twin of the rank-≤k window —
  * see [[TopKByScoreAgg]] for the ordering contract. */
private[functions] final class TopKState(val k: Int) {
  // parallel arrays, entry i = (nullScore(i), score(i), id(i)), kept sorted
  // best-first under TopKState.beats; n ≤ k always
  val nullScore = new Array[Boolean](k)
  val score = new Array[Double](k)
  val id = new Array[Long](k)
  var n = 0

  def insert(sNull: Boolean, s: Double, i: Long): Unit = {
    // position = first slot the new entry beats (stable: ties keep the
    // earlier-inserted entry only if it genuinely compares lower — the
    // comparator is a total order over distinct (score,id), and equal
    // (score,id) duplicates rank adjacently, matching row_number)
    var pos = 0
    while (pos < n && !TopKState.beats(sNull, s, i, nullScore(pos), score(pos), id(pos)))
      pos += 1
    if (pos < k) {
      val last = math.min(n, k - 1)
      var j = last
      while (j > pos) {
        nullScore(j) = nullScore(j - 1); score(j) = score(j - 1); id(j) = id(j - 1)
        j -= 1
      }
      nullScore(pos) = sNull; score(pos) = s; id(pos) = i
      if (n < k) n += 1
    }
  }
}

private[functions] object TopKState {
  /** Does entry a rank strictly before entry b under the window order
    * `score DESC NULLS LAST, id ASC`? Double comparison reproduces Spark
    * SQL ordering exactly: `==` first (so -0.0 ties 0.0, unlike
    * Double.compare), then Double.compare (NaN greater than every other
    * value, as in Spark's sort and predicates). */
  def beats(aNull: Boolean, as: Double, ai: Long,
      bNull: Boolean, bs: Double, bi: Long): Boolean = {
    if (aNull != bNull) return !aNull // non-null score ranks first (DESC NULLS LAST)
    if (!aNull && as != bs) {
      val c = java.lang.Double.compare(as, bs)
      if (c != 0) return c > 0 // DESC: larger score first; NaN first
    }
    ai < bi
  }
}

/** Top-k rows by `score DESC NULLS LAST, id ASC` as a native mergeable
  * aggregate — the §2.3 "aggregate before you shuffle" replacement for
  * the `row_number().over(Window.partitionBy(g).orderBy(score.desc, id))
  * ≤ k` idiom on the similarity/recall paths.
  *
  * The window shape shuffles EVERY scored candidate row to its group's
  * reducer and sorts the group (at the exact-truth side that is
  * queries·corpus rows — data-proportional at 100 TB); this aggregate
  * collapses each map partition's candidates to ≤k entries per group
  * before the exchange, so the shuffle carries ≤ k·partitions rows per
  * group and no sort runs anywhere. Output is the array of the k
  * best (score, id) structs in rank order — element i is exactly the
  * window's rank i+1 row, BIT-IDENTICAL tiebreaks included: the
  * comparator reproduces Spark SQL's double ordering (NaN largest,
  * -0.0 = 0.0, DESC NULLS LAST) and breaks ties on id ascending.
  *
  * Precondition: `id` is non-null (every call site ranks table keys).
  * A null id row would sort NULLS FIRST under the window's `id ASC` but
  * ranks as id=Long.MinValue here — same position, so even that matches.
  */
case class TopKByScoreAgg(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKState] {

  require(k > 0, "top-k capacity must be positive")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = true),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "topk_by_score"

  override def createAggregationBuffer(): TopKState = new TopKState(k)

  override def update(buffer: TopKState, input: InternalRow): TopKState = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    val idv = if (i == null) Long.MinValue else i.asInstanceOf[Long]
    if (s == null) buffer.insert(sNull = true, 0.0, idv)
    else buffer.insert(sNull = false, s.asInstanceOf[Double], idv)
    buffer
  }

  override def merge(buffer: TopKState, other: TopKState): TopKState = {
    var i = 0
    while (i < other.n) {
      buffer.insert(other.nullScore(i), other.score(i), other.id(i))
      i += 1
    }
    buffer
  }

  override def eval(buffer: TopKState): Any = {
    val rows = new Array[Any](buffer.n)
    var i = 0
    while (i < buffer.n) {
      rows(i) = new GenericInternalRow(Array[Any](
        if (buffer.nullScore(i)) null else buffer.score(i), buffer.id(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: TopKState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.n)
    var i = 0
    while (i < buffer.n) {
      out.writeBoolean(buffer.nullScore(i))
      out.writeDouble(buffer.score(i))
      out.writeLong(buffer.id(i))
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val st = new TopKState(k)
    var i = 0
    while (i < n) { // arrives rank-ordered; insert preserves it
      st.insert(in.readBoolean(), in.readDouble(), in.readLong())
      i += 1
    }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScoreAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScoreAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScoreAgg =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKAgg {
  /** Column face: the k best (score, id) structs in rank order under
    * `score DESC NULLS LAST, id ASC` — element i = the rank-(i+1) row of
    * the equivalent window. Consume with posexplode for (rank-1, row). */
  def byScore(score: Column, id: Column, k: Int): Column =
    GraftExprBridge.column(
      TopKByScoreAgg(GraftExprBridge.expression(score),
        GraftExprBridge.expression(id), k).toAggregateExpression())
}
