package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document hash sketches. The composed forms (explode each
  * shingle → 128 min()/64 sum() aggregate columns) are correct and
  * map-side-combined, but pay an explode shuffle and hundreds of millions of aggregate
  * updates; these expressions compute the whole sketch in ONE tight
  * loop per document — no explode, no shuffle, no aggregation state.
  * Hash values are IDENTICAL to the Column forms (xxhash64 seed 42,
  * salted second hash via byte-concat, rotate/xor mixing), so banding /
  * estimate semantics and all recall math carry over unchanged.
  *
  * Evaluated once per ROW (not per pair), so CodegenFallback costs one
  * virtual call per document — nothing.
  */
private[graft] object Sketch {
  final val Seed = 42L
  private val salt = UTF8String.fromString("#2")

  def hashPair(g: UTF8String): (Long, Long) = {
    val h1 = XXH64.hashUnsafeBytes(g.getBaseObject, g.getBaseOffset,
      g.numBytes(), Seed)
    val salted = UTF8String.concat(g, salt)
    val h2 = XXH64.hashUnsafeBytes(salted.getBaseObject,
      salted.getBaseOffset, salted.numBytes(), Seed)
    (h1, h2)
  }

  @inline def rotl(v: Long, s: Int): Long =
    if ((s & 63) == 0) v else (v << s) | (v >>> (64 - s))

  @inline def mix(h1: Long, h2: Long, j: Int): Long =
    if (j < 64) rotl(h1, j) ^ h2 else rotl(h2, j - 64) ^ h1

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Portable 60-bit hash: top 15 hex chars of md5 (= first 8 digest
    * bytes big-endian >>> 4) — the single definition both sketch
    * expressions share, bit-identical to `Dedup.md5Hash60`'s
    * `conv(substr(md5, 1, 15), 16, 10)` and to any engine's
    * CAST('0x' || substr(md5(x), 1, 15) AS BIGINT). */
  def md5_60(t: UTF8String): Long = {
    val digest = md5.get()
    digest.reset()
    val d = digest.digest(t.getBytes)
    var acc = 0L
    var k = 0
    while (k < 8) { acc = (acc << 8) | (d(k) & 0xFFL); k += 1 }
    acc >>> 4
  }
}

/** array<string> shingles → array<long> MinHash signature. */
case class MinHashSignatureExpr(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  require(numHashes <= 128)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val g = arr.getUTF8String(i)
      if (g != null) {
        val (h1, h2) = Sketch.hashPair(g)
        var j = 0
        while (j < numHashes) {
          val m = Sketch.mix(h1, h2, j)
          if (m < sig(j)) sig(j) = m
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** array<string> tokens → 64-bit SimHash fingerprint. */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null) {
        val h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset,
          t.numBytes(), Sketch.Seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(fp)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** array<string> tokens → 60-bit PORTABLE SimHash: votes come from the
  * top 15 hex chars of each token's md5 (= the md5 digest's first 8
  * big-endian bytes >>> 4), so any engine with md5 restates the
  * fingerprint bit-exactly — this is the oracle-checkable twin of
  * [[SimHash64Expr]] (the Column form in `Dedup.simhashBits` is the
  * parity reference; both are tested equal).
  */
case class SimHashMd5Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](60)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null) {
        val h = Sketch.md5_60(t)
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(fp)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** string → array<long> of DISTINCT winnowing fingerprints (sorted):
  * md5-60 hashes of the k-char grams, minimum per sliding window of
  * `w` hashes (monotonic-deque, O(n) per doc), deduped. Bit-identical
  * to the HOF construction in TextAnalysisSpec's parity test and to
  * the q64/q65 DuckDB restatement — but one tight loop per document
  * instead of ~n interpreted md5/conv string expressions plus an
  * O(n·w) slice-copy window pass (9 s → sub-second at sf0.1).
  * Returns an empty array for docs shorter than k.
  */
case class WinnowingExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1 && w >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val n = u.numChars()
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val m = n - k + 1
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      // SQL substr semantics (character-based) — same grams as the
      // Column twin and DuckDB's substr(text, i, k)
      hs(i) = Sketch.md5_60(u.substringSQL(i + 1, k))
      i += 1
    }
    val wc = math.max(m - w + 1, 1)
    val mins = new Array[Long](wc)
    // monotonic deque of indices; hs(deque head) = current window min
    val dq = new Array[Int](m)
    var head = 0
    var tail = 0 // [head, tail) holds candidate indices, values ascending
    i = 0
    while (i < m) {
      while (tail > head && hs(dq(tail - 1)) >= hs(i)) tail -= 1
      dq(tail) = i; tail += 1
      val winStart = i - w + 1
      while (dq(head) < winStart) head += 1
      if (i >= w - 1) mins(i - w + 1) = hs(dq(head))
      i += 1
    }
    if (m < w) mins(0) = hs(dq(head)) // single truncated window
    java.util.Arrays.sort(mins)
    var out = 0
    i = 0
    while (i < wc) { // compact to distinct (sorted)
      if (i == 0 || mins(i) != mins(i - 1)) { mins(out) = mins(i); out += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(mins, out))
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** array<double> vector → array<int> of sign-LSH bucket ids, one per
  * table. The Column form (16 tables × numPlanes zip_with/aggregate
  * chains over plane-weight array LITERALS) carries ~6k literal nodes in
  * the plan and re-evaluates the HOF lambdas per table; this computes
  * every table's bucket in one tight loop per row. Plane weights are a
  * constructor argument (serialized with the expression, not plan
  * literals) and the dot product folds in ascending index order — bucket
  * ids are bit-identical to the Column form for equal-length inputs.
  */
case class SignLshBucketsExpr(child: Expression,
    planes: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {
  import org.apache.spark.sql.types.IntegerType
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData].toDoubleArray()
    val out = new Array[Int](planes.length)
    var t = 0
    while (t < planes.length) {
      val table = planes(t)
      var bucket = 0
      var p = 0
      while (p < table.length) {
        val w = table(p)
        val lim = math.min(w.length, v.length)
        var dot = 0.0
        var i = 0
        while (i < lim) { dot += v(i) * w(i); i += 1 }
        if (dot > 0) bucket |= (1 << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** array<string> words → array<struct<pos int, h long>> of POSITIONED
  * md5-60 L-gram anchors — the [[graft.ops.Dedup.duplicateSpans]] /
  * `duplicateCoverage` gram stream in ONE native pass per document.
  * Bit-identical to the composed Column form
  * `transform(sequence(1, n-l+1), i -> struct(i, conv(substring(md5(
  * concat_ws(' ', slice(w, i, l))), 1, 15), 16, 10)))` (parity-pinned
  * in CorpusOpsSpec): positions are 1-based, the hash is
  * [[Sketch.md5_60]] over the space-joined slice via the SAME
  * UTF8String.concatWs the builtin uses. The composed form pays a
  * 32-char hex string + substring + base-16 parse per gram; this goes
  * digest-bytes → long directly. Evaluated once per row —
  * CodegenFallback costs one virtual call per document. Fewer than l
  * words → empty array (callers filter first, but the contract is
  * total). */
case class GramHash60Expr(child: Expression, l: Int)
    extends UnaryExpression with CodegenFallback {
  require(l >= 1, s"gram length must be >= 1, got $l")

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pos",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("h", LongType,
        nullable = false))), containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < l) return new GenericArrayData(Array.empty[Any])
    val sep = UTF8String.fromString(" ")
    val words = new Array[UTF8String](n)
    var k = 0
    while (k < n) { words(k) = arr.getUTF8String(k); k += 1 }
    val out = new Array[Any](n - l + 1)
    val window = new Array[UTF8String](l)
    var i = 0
    while (i <= n - l) {
      var j = 0
      while (j < l) { window(j) = words(i + j); j += 1 }
      val gram = UTF8String.concatWs(sep, window: _*)
      out(i) = org.apache.spark.sql.catalyst.InternalRow(
        i + 1, Sketch.md5_60(gram))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object HashSketches {
  import org.apache.spark.sql.GraftBridge

  def minhashSignature(grams: Column, numHashes: Int): Column =
    GraftBridge.column(
      MinHashSignatureExpr(GraftBridge.expression(grams), numHashes))

  /** words → positioned md5-60 L-gram anchors (see [[GramHash60Expr]]). */
  def gramHash60(words: Column, l: Int): Column =
    GraftBridge.column(GramHash60Expr(GraftBridge.expression(words), l))

  def simhash64(tokens: Column): Column =
    GraftBridge.column(SimHash64Expr(GraftBridge.expression(tokens)))

  def simhashMd5_60(tokens: Column): Column =
    GraftBridge.column(SimHashMd5Expr(GraftBridge.expression(tokens)))

  def winnowing(text: Column, k: Int, w: Int): Column =
    GraftBridge.column(WinnowingExpr(GraftBridge.expression(text), k, w))

  /** @param planes [table][plane][dim] weights (see
    *               [[graft.ops.Similarity.lshBucket]] for the seeded
    *               generator this must match). */
  def signLshBuckets(vec: Column,
      planes: Array[Array[Array[Double]]]): Column =
    GraftBridge.column(
      SignLshBucketsExpr(GraftBridge.expression(vec), planes))
}
