package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** The MinHash signature kernel, shared by the native expression below
  * and any JVM-side caller. Hashing is murmur3(seed 42) over the UTF-8
  * bytes — the exact definition of Spark's `hash()` on a string column —
  * taken straight from the UnsafeArrayData backing store, so no
  * UTF8String→java.lang.String conversion happens anywhere on the path.
  */
object MinhashKernel {

  val MersennePrime = 2147483647L // 2^31 - 1

  /** 128 fixed (a, b) permutation pairs from a small deterministic LCG
    * (no runtime randomness; a forced odd). */
  val Perms: Array[(Long, Long)] = {
    var x = 0x5deece66dL
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; (x >>> 17) & 0x7fffffffL }
    Array.fill(128)((next() | 1L, next()))
  }

  /** sig[k] = min over shingles of pmod(a_k · pmod(h, P) + b_k, P).
    * Empty shingle sets have no meaningful signature: returns null so the
    * expression yields SQL NULL (the HOF form's min-over-empty is null
    * too) rather than a sentinel signature of Long.MaxValue that would
    * spuriously band-match every other empty doc. */
  def sig(arr: ArrayData): ArrayData = {
    val p = MersennePrime
    val n = arr.numElements()
    if (n == 0) return null
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val u = arr.getUTF8String(i)
      val h = Murmur3_x86_32.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42)
      hs(i) = ((h.toLong % p) + p) % p
      i += 1
    }
    val out = new Array[Long](Perms.length)
    var k = 0
    while (k < Perms.length) {
      val a = Perms(k)._1; val b = Perms(k)._2
      var m = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = (((a * hs(j) + b) % p) + p) % p
        if (v < m) m = v
        j += 1
      }
      out(k) = m
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** Distinct word-trigram kernel over in-place UTF8String tokens
  * (first-occurrence order — identical to `array_distinct` over the
  * HOF-built trigrams). */
object ShingleKernel {
  private val Space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
  def shingles(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    var i = 0
    while (i <= n - 3) {
      seen.add(org.apache.spark.unsafe.types.UTF8String.concat(
        toks.getUTF8String(i), Space, toks.getUTF8String(i + 1), Space,
        toks.getUTF8String(i + 2)))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }
}

/** Native trigram-shingle expression: array<string> tokens →
  * array<string> distinct trigrams, one static-kernel call per row. */
case class ShingleArray(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    ShingleKernel.shingles(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernel.shingles($c)")
  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)
  override def prettyName: String = "shingle_array"
}

/** Native Catalyst expression for the MinHash signature (the brief's
  * preferred extension tier: a codegen'd `Expression` beats a Scala UDF —
  * no encoder boundary, no per-row Seq[String] materialization; the
  * generated code is one static call into [[MinhashKernel.sig]] reading
  * UTF8String slices in place). Input: array<string> shingles; output:
  * array<bigint> of 128 signature values. */
case class MinhashSignature(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // nullable even over non-null children: empty shingle arrays map to NULL
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    MinhashKernel.sig(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinhashKernel.sig($c);
      ${ev.isNull} = (${ev.value} == null);
    """)
  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
  override def prettyName: String = "minhash_signature"
}
