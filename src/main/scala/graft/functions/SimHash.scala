package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SimHash-64 over a token array — a native Catalyst expression.
  *
  * SimHash (Charikar, STOC 2002; used by Manku et al., WWW 2007 for
  * web-scale near-dup detection): hash every token to 64 bits, take a
  * per-bit ±1 vote across tokens, emit the sign vector as a 64-bit
  * fingerprint. Near-duplicate documents differ in few bits, so
  * near-dup search becomes Hamming-distance ≤ k over longs — at
  * corpus scale that is a band-join on rotated fingerprint prefixes,
  * never a pairwise scan.
  *
  * Token hash = first 8 bytes of md5(token), big-endian — md5 is
  * deliberately chosen over Spark-internal Murmur3 for the same reason
  * the MinHash family uses it (see [[graft.ops.Dedup.minhash]]):
  * engine-portable, so fingerprints are verifiable bit-for-bit in any
  * SQL engine (the DuckDB oracle reconstructs the same 64 bits from
  * `md5()` hex nibbles).
  *
  * Implemented as a UnaryExpression with a hand-written doGenCode (not
  * a UDF): no boxing, participates in whole-stage codegen.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64 requires array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    java.lang.Long.valueOf(SimHash64.hashTokens(arr))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.hashTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 = copy(child = newChild)
  override def prettyName: String = "simhash64"
}

object SimHash64 {
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 64-bit token hash: first 8 bytes of md5(token), big-endian. */
  def tokenHash64(t: UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(t.getBytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i).toLong & 0xffL); i += 1 }
    h
  }

  /** Shared by interpreted eval and generated code. */
  def hashTokens(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = tokenHash64(arr.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Hamming distance between two simhash fingerprints. */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}

/** Column-level entry points for the custom expressions. */
object functions {
  import org.apache.spark.sql.graftshim.ColumnShim

  /** simhash64(tokens: array<string>): bigint */
  def simhash64(tokens: Column): Column =
    ColumnShim.column(SimHash64(ColumnShim.expression(tokens)))

  /** Hamming distance between two bigint fingerprints, as built-ins. */
  def hamming64(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b)).cast("int")
}
