package graft.plans

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable
import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min-sketch heavy hitters as a *mergeable* aggregate (Cormode &
  * Muthukrishnan, J. Algorithms 2005) — the one-pass answer to "top tokens
  * by frequency" when the vocabulary is too large to groupBy exactly.
  *
  * Each partition keeps a fixed d×w counter matrix plus a bounded
  * candidate set (the CMS+heap construction): updating increments one
  * counter per row and keeps the candidate set at the `cap` tokens with
  * the highest sketch estimates; merging sums the counter matrices
  * (order-independent) and re-ranks the UNION of candidate sets under the
  * merged sketch. Only O(d·w + cap) bytes per group ever cross the
  * shuffle — vs the exact p5 formulation's full (token, count) vocabulary.
  * Estimates are one-sided: est ≥ true count always; est ≤ true + εN with
  * high probability (ε ≈ e/w).
  *
  * Determinism: MurmurHash3 row hashes are fixed; counter sums are
  * order-independent; and merge() deliberately does NOT prune — it only
  * unions candidate sets (commutative/associative), so the merged result
  * never depends on Spark's merge order. Pruning happens at exactly two
  * order-insensitive points: inside a partition against that partial's
  * own counters (at serialize, bounding shuffle bytes at O(d·w + cap) per
  * partial), and at eval against the FINAL counters. The union crossing
  * eval is ≤ partials × cap — bounded by the partition count, not the
  * vocabulary. A global top-k token can only be lost if it was pruned
  * from EVERY partial, which cap ≫ k makes implausible (it would have to
  * trail `cap` locally-heavier tokens in every partition it touches).
  * That guarantee is PROBABILISTIC, not structural: serialize-time
  * pruning ranks against partition-local counters, so under adversarial
  * skew a global top-k token concentrated in no partition's local top
  * `cap` is silently lost. The `cap >= 8*k` floor below keeps the loss
  * probability negligible for Zipf-like corpora; the companion spec's
  * repartition-invariance check is evidence over the fixture, not proof.
  */
case class CmsTopKAggregate(
    tokenExpr: Expression,
    k: Int,
    depth: Int = 4,
    width: Int = 2048,
    cap: Int = 256,
    md5Rows: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsTopKAggregate.Buffer] {

  import CmsTopKAggregate.Buffer

  require(cap >= 8 * k,
    s"candidate cap $cap must be >= 8*k=${8 * k}: serialize-time pruning is " +
      "partition-local, and a thin cap makes losing a global top-k token " +
      "under skew plausible rather than negligible")
  require(!md5Rows || depth * 3 <= 32,
    s"md5 row hashes take 3 hex digits each: depth $depth exceeds the digest")

  override def children: Seq[Expression] = Seq(tokenExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = if (md5Rows) "cms_top_k_md5" else "cms_top_k"

  /** All `depth` row buckets of one token. Production family: MurmurHash3
    * (fast, not expressible in ANSI SQL). Oracle family (`md5Rows`): row r
    * reads hex digits [3r+1, 3r+3] of md5(token) mod width — ONE digest
    * per token, each row a disjoint 12-bit slice, replayable
    * digit-for-digit in DuckDB (the d4/d5 md5-twin recipe applied to the
    * sketch family). */
  private def buckets(token: String): Array[Int] = {
    val out = new Array[Int](depth)
    if (md5Rows) {
      val d = CmsTopKAggregate.md5Bytes(token)
      // nibble j (0-based) = hex digit j+1 of the hex rendering
      def nib(j: Int): Int = (d(j / 2) >> (4 * (1 - j % 2))) & 0xf
      var r = 0
      while (r < depth) {
        val v = (nib(r * 3) << 8) | (nib(r * 3 + 1) << 4) | nib(r * 3 + 2)
        out(r) = v % width
        r += 1
      }
    } else {
      var r = 0
      while (r < depth) {
        val h = MurmurHash3.stringHash(token, 0x9747b28c + r)
        out(r) = java.lang.Math.floorMod(h, width)
        r += 1
      }
    }
    out
  }

  /** Sketch point query: min over rows (the CMS estimator). */
  private def estimate(buf: Buffer, token: String): Long = {
    val bs = buckets(token)
    var e = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = buf.counters(i * width + bs(i))
      if (c < e) e = c
      i += 1
    }
    e
  }

  override def createAggregationBuffer(): Buffer =
    Buffer(new Array[Long](depth * width), mutable.HashSet.empty)

  private def pruneTo(buf: Buffer, n: Int): Unit = {
    if (buf.cand.size > n) {
      val keep = buf.cand.toSeq
        .map(t => (t, estimate(buf, t)))
        .sortBy { case (t, e) => (-e, t) }
        .take(n).map(_._1)
      buf.cand.clear()
      buf.cand ++= keep
    }
  }

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = tokenExpr.eval(input)
    if (v != null) {
      val token = v.asInstanceOf[UTF8String].toString
      val bs = buckets(token)
      var i = 0
      while (i < depth) {
        buf.counters(i * width + bs(i)) += 1
        i += 1
      }
      if (!buf.cand.contains(token)) {
        buf.cand += token
        // prune lazily at 2×cap: amortizes the O(cap log cap) re-rank
        // over cap insertions instead of paying it per new token
        pruneTo(buf, if (buf.cand.size > 2 * cap) cap else buf.cand.size)
      }
    }
    buf
  }

  override def merge(a: Buffer, b: Buffer): Buffer = {
    var i = 0
    while (i < a.counters.length) { a.counters(i) += b.counters(i); i += 1 }
    // union WITHOUT pruning: pruning here would rank candidates under
    // intermediate counter sums, making survivors depend on Spark's merge
    // order; the union is commutative and bounded by partials × cap
    a.cand ++= b.cand
    a
  }

  override def eval(buf: Buffer): Any = {
    val top = buf.cand.toSeq
      .map(t => (t, estimate(buf, t)))
      .sortBy { case (t, e) => (-e, t) }
      .take(k)
    new GenericArrayData(top.map { case (t, e) =>
      InternalRow(UTF8String.fromString(t), e)
    }.toArray[Any])
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    pruneTo(buf, cap)
    val tokens = buf.cand.toSeq.map(_.getBytes(StandardCharsets.UTF_8))
    val bb = ByteBuffer.allocate(
      4 + buf.counters.length * 8 + 4 + tokens.map(4 + _.length).sum)
    bb.putInt(buf.counters.length)
    buf.counters.foreach(bb.putLong)
    bb.putInt(tokens.size)
    tokens.foreach { t => bb.putInt(t.length); bb.put(t) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val counters = new Array[Long](bb.getInt)
    var i = 0
    while (i < counters.length) { counters(i) = bb.getLong; i += 1 }
    val n = bb.getInt
    val cand = mutable.HashSet.empty[String]
    i = 0
    while (i < n) {
      val t = new Array[Byte](bb.getInt)
      bb.get(t)
      cand += new String(t, StandardCharsets.UTF_8)
      i += 1
    }
    Buffer(counters, cand)
  }

  override def withNewMutableAggBufferOffset(o: Int): CmsTopKAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsTopKAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsTopKAggregate =
    copy(tokenExpr = newChildren(0))
}

object CmsTopKAggregate {
  /** Mutable aggregation state: the d×w counter matrix and the bounded
    * heavy-hitter candidate set. */
  case class Buffer(counters: Array[Long], cand: mutable.HashSet[String])

  /** cms_top_k(token, k) → array<struct<token,est>> best-first. */
  def cmsTopK(token: Column, k: Int): Column =
    ColumnBridge.column(
      CmsTopKAggregate(ColumnBridge.expression(token), k)
        .toAggregateExpression())

  /** The md5-row-hash twin — identical sketch, ANSI-SQL-replayable rows. */
  def cmsTopKMd5(token: Column, k: Int): Column =
    ColumnBridge.column(
      CmsTopKAggregate(ColumnBridge.expression(token), k, md5Rows = true)
        .toAggregateExpression())

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** MD5 digest of a string's UTF-8 bytes (thread-local digest instance —
    * this runs per token on the hot update path). */
  def md5Bytes(s: String): Array[Byte] = {
    val d = md.get(); d.reset(); d.digest(s.getBytes(StandardCharsets.UTF_8))
  }

}
