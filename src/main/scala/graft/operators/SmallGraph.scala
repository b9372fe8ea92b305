package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Shared bounded-collect harness for the small-graph driver fast paths
  * ([[Components]], [[KCore]], [[Bfs]], [[Dag]]). Contract (established in
  * Components.labels and re-stated here once):
  *
  *  - The caller has ALREADY proven, with a DISTRIBUTED count, that the
  *    edge list fits the driver (<= its cutoff); collect is bounded BY
  *    CONSTRUCTION and the distributed loop is taken otherwise.
  *  - Only well-behaved id types ride the fast path: integral types
  *    (remapped through PRIMITIVE long arrays — sort + unique + binary
  *    search, ~16 bytes/edge retained, no boxed HashMap) and strings
  *    (value-equal JVM keys). Anything else — BinaryType ids collect as
  *    Array[Byte] and compare by REFERENCE, mixed numeric types unify
  *    under SQL coercion but not under JVM equals — returns None and the
  *    caller falls through to the distributed loop, which compares by SQL
  *    semantics. ([[Components]] additionally requires integral ids: its
  *    min-label semantics need dense-index order == id order, which the
  *    sorted long remap provides and first-seen string interning does
  *    not.)
  *  - Results ride back as a small DataFrame ([[rideBack]]) and the final
  *    one-row-per-vertex join stays distributed — `vertices` is never
  *    collected.
  */
private[operators] object SmallGraph {

  private val integralTypes: Set[DataType] =
    Set(ByteType, ShortType, IntegerType, LongType)

  /** Dense 0..n-1 remap of a collected small graph: edge endpoint arrays,
    * the dense indices of the (optional) extras frame's values, and the
    * reverse map back to ORIGINAL-typed id values. */
  private[operators] trait Mapped {
    def us: Array[Int]
    def vs: Array[Int]
    /** total distinct ids (edge endpoints plus extras) */
    def n: Int
    /** dense index of each collected extras row (seeds, etc.) */
    def extraIdx: Array[Int]
    /** original-typed id value for dense index i (safe to put in a Row
      * under the id DataType reported at collect time) */
    def idValue(i: Int): Any
  }

  private final class LongMapped(val us: Array[Int], val vs: Array[Int],
      val extraIdx: Array[Int], ids: Array[Long], dt: DataType)
      extends Mapped {
    def n: Int = ids.length
    def idValue(i: Int): Any = dt match {
      case ByteType => ids(i).toByte
      case ShortType => ids(i).toShort
      case IntegerType => ids(i).toInt
      case _ => ids(i)
    }
  }

  private final class StringMapped(val us: Array[Int], val vs: Array[Int],
      val extraIdx: Array[Int], ids: Array[String]) extends Mapped {
    def n: Int = ids.length
    def idValue(i: Int): Any = ids(i)
  }

  /** Collect a (src, dst) edge frame — plus an optional one-column extras
    * frame whose values must also be remapped (BFS seeds) — and build the
    * dense remap. Returns None when the id types are not fast-path-safe:
    * every involved column must have the SAME type, integral (always) or
    * string (unless `requireOrdered`, for min-label semantics). The
    * caller MUST have count-gated both frames first. */
  def collect(edges2: DataFrame, extras: Option[DataFrame],
      requireOrdered: Boolean = false): Option[Mapped] = {
    import org.apache.spark.sql.functions.col
    val types = edges2.schema.map(_.dataType) ++
      extras.toSeq.flatMap(_.schema.map(_.dataType))
    val dt = types.head
    val uniform = types.forall(_ == dt)
    if (uniform && integralTypes(dt)) {
      val cols = edges2.columns
      val eRows = edges2
        .select(col(cols(0)).cast("long"), col(cols(1)).cast("long"))
        .collect()
      val xRows = extras.map { x =>
        x.select(col(x.columns(0)).cast("long")).collect()
      }.getOrElse(Array.empty[Row])
      // null endpoints/seeds: the distributed loops silently ignore them
      // (SQL join semantics) but getLong below would NPE — decline the
      // fast path and let the distributed loop keep its semantics
      if (eRows.exists(r => r.isNullAt(0) || r.isNullAt(1)) ||
          xRows.exists(_.isNullAt(0))) return None
      // sorted-unique remap over PRIMITIVE longs: index order == id order
      // (what Components' min-root union-find relies on), ~50 MB retained
      // at the 2M-edge cutoff instead of a boxed HashMap's several hundred
      val raw = new Array[Long](eRows.length * 2 + xRows.length)
      var i = 0
      while (i < eRows.length) {
        raw(2 * i) = eRows(i).getLong(0)
        raw(2 * i + 1) = eRows(i).getLong(1)
        i += 1
      }
      i = 0
      while (i < xRows.length) {
        raw(eRows.length * 2 + i) = xRows(i).getLong(0); i += 1
      }
      java.util.Arrays.sort(raw)
      val ids = new Array[Long](raw.length)
      var nIds = 0
      i = 0
      while (i < raw.length) {
        if (nIds == 0 || ids(nIds - 1) != raw(i)) { ids(nIds) = raw(i); nIds += 1 }
        i += 1
      }
      val dense = java.util.Arrays.copyOf(ids, nIds)
      def at(x: Long): Int = java.util.Arrays.binarySearch(dense, x)
      val us = new Array[Int](eRows.length)
      val vs = new Array[Int](eRows.length)
      i = 0
      while (i < eRows.length) {
        us(i) = at(eRows(i).getLong(0)); vs(i) = at(eRows(i).getLong(1))
        i += 1
      }
      val xi = new Array[Int](xRows.length)
      i = 0
      while (i < xRows.length) { xi(i) = at(xRows(i).getLong(0)); i += 1 }
      Some(new LongMapped(us, vs, xi, dense, dt))
    } else if (uniform && dt == StringType && !requireOrdered) {
      val eRows = edges2.collect()
      val xRows = extras.map(_.collect()).getOrElse(Array.empty[Row])
      // same null contract as the integral branch: decline, don't crash
      if (eRows.exists(r => r.isNullAt(0) || r.isNullAt(1)) ||
          xRows.exists(_.isNullAt(0))) return None
      val idx = new java.util.HashMap[String, Integer](
        eRows.length * 2 + xRows.length)
      val rev = scala.collection.mutable.ArrayBuffer.empty[String]
      def at(x: String): Int = {
        val cur = idx.get(x)
        if (cur eq null) { val k = rev.length; idx.put(x, k); rev += x; k }
        else cur.intValue()
      }
      val us = new Array[Int](eRows.length)
      val vs = new Array[Int](eRows.length)
      var i = 0
      while (i < eRows.length) {
        us(i) = at(eRows(i).getString(0)); vs(i) = at(eRows(i).getString(1))
        i += 1
      }
      val xi = new Array[Int](xRows.length)
      i = 0
      while (i < xRows.length) { xi(i) = at(xRows(i).getString(0)); i += 1 }
      Some(new StringMapped(us, vs, xi, rev.toArray))
    } else None
  }

  /** CSR adjacency (out-edges) over the remapped pairs. */
  def csr(us: Array[Int], vs: Array[Int], n: Int)
      : (Array[Int], Array[Int]) = {
    val deg = new Array[Int](n)
    var i = 0
    while (i < us.length) { deg(us(i)) += 1; i += 1 }
    val off = new Array[Int](n + 1)
    i = 0
    while (i < n) { off(i + 1) = off(i) + deg(i); i += 1 }
    val adj = new Array[Int](us.length)
    val fill = java.util.Arrays.copyOf(off, n)
    i = 0
    while (i < us.length) {
      adj(fill(us(i))) = vs(i); fill(us(i)) += 1; i += 1
    }
    (off, adj)
  }

  /** Growable primitive int FIFO — the queue the peel/BFS/Kahn loops
    * drain without boxing every vertex into an Integer deque. */
  private[operators] final class IntQueue(initialCapacity: Int) {
    private var buf = new Array[Int](math.max(16, initialCapacity))
    private var head = 0
    private var tail = 0
    def isEmpty: Boolean = head == tail
    def add(x: Int): Unit = {
      if (tail == buf.length) {
        if (head >= buf.length / 2) {
          System.arraycopy(buf, head, buf, 0, tail - head)
          tail -= head; head = 0
        } else buf = java.util.Arrays.copyOf(buf, buf.length * 2)
      }
      buf(tail) = x; tail += 1
    }
    def poll(): Int = { val x = buf(head); head += 1; x }
    def size: Int = tail - head
  }

  /** Parallelize driver-built result rows back into a DataFrame (the
    * standard ride-back: small by the count gate, re-partitioned so a
    * full-cutoff result still spreads). */
  def rideBack(spark: SparkSession, rows: Seq[Row], schema: StructType)
      : DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.length / 500000)),
      schema)
}
