package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Second REAL pure-JVM media decoder (sibling of [[Wav]]): canonical
  * 24-bit uncompressed Windows BMP (BITMAPFILEHEADER +
  * BITMAPINFOHEADER) as a native Catalyst expression. BMP is the one
  * raster format decodable without a codec library, and it carries the
  * three classic layout traps an honest decoder must handle:
  * rows are stored BOTTOM-UP (positive biHeight), channels are BGR
  * (not RGB), and every row pads to a 4-byte stride. `bmp_stats`
  * walks the real bytes — it locates the pixel array via the file
  * header's data offset (never assuming 54), checks magic / header
  * sizes / bpp 24 / compression 0 / bounds, and computes exact BIGINT
  * channel sums plus the LOGICAL top-left pixel, which lives in the
  * LAST stored row — a decoder that reads the first stored row gets
  * the bottom row and fails the oracle. NULL for anything malformed.
  *
  * `bmp_synth` is the fixture half ([[Wav.synth]]'s pattern): real BMP
  * bytes with doc_id-derived dimensions and a closed-form pixel fill
  * in logical raster order, so the DuckDB oracle predicts the decoder's
  * output arithmetically without parsing binary. The decoder never
  * sees the parameters — only the bytes. Both run inside whole-stage
  * codegen via static helpers.
  */
object Bmp {

  /** Decoded stats schema: NULL struct = not a valid 24-bit BMP. */
  val statsType: StructType = StructType(Seq(
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("stride", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("tl_b", LongType, nullable = false),
    StructField("tl_g", LongType, nullable = false),
    StructField("tl_r", LongType, nullable = false)))

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** Parse a canonical bottom-up 24-bit uncompressed BMP; null for
    * anything malformed (short file, wrong magic, non-BITMAPINFOHEADER,
    * bpp ≠ 24, compressed, top-down, zero/absurd dims, pixel array out
    * of bounds). Called from generated code. */
  def stats(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length < 54) return null
    if (bytes(0) != 'B' || bytes(1) != 'M') return null
    val pixOff = u32(bytes, 10)
    if (u32(bytes, 14) != 40) return null // BITMAPINFOHEADER only
    val w = u32(bytes, 18).toInt
    val hRaw = u32(bytes, 22).toInt
    if (hRaw <= 0) return null // top-down (negative height) refused
    val h = hRaw
    if (w <= 0 || w > (1 << 20) || h > (1 << 20)) return null
    if (u16(bytes, 26) != 1) return null // planes
    if (u16(bytes, 28) != 24) return null // 24-bit only
    if (u32(bytes, 30) != 0L) return null // BI_RGB (uncompressed) only
    val stride = ((3L * w + 3) / 4) * 4
    val need = pixOff + stride * h
    if (pixOff < 54 || need > bytes.length) return null // truncated pixels
    var sb = 0L; var sg = 0L; var sr = 0L
    var r = 0
    while (r < h) {
      val row = pixOff + r.toLong * stride
      var x = 0
      while (x < w) {
        val o = (row + 3L * x).toInt
        sb += bytes(o) & 0xff; sg += bytes(o + 1) & 0xff; sr += bytes(o + 2) & 0xff
        x += 1
      }
      r += 1
    }
    // logical top row is the LAST stored row (bottom-up layout)
    val tl = (pixOff + (h - 1).toLong * stride).toInt
    InternalRow(w.toLong, h.toLong, stride, sb, sg, sr,
      (bytes(tl) & 0xff).toLong, (bytes(tl + 1) & 0xff).toLong,
      (bytes(tl + 2) & 0xff).toLong)
  }

  /** Render a real canonical 24-bit BMP with doc_id-derived closed-form
    * parameters the oracle replicates:
    * w = 2 + id%6, h = 1 + id%4, seed = (31·id + 7·len) with
    * len = text BYTE length; pixel at LOGICAL (x, y-from-top),
    * raster index p = y·w + x, gets channels
    * b = (seed + 3p) % 256, g = (seed + 3p + 1) % 256,
    * r = (seed + 3p + 2) % 256. Rows are written BOTTOM-UP in BGR with
    * 4-byte stride padding (pad bytes 0), and the pixel array starts at
    * offset 54 + a 2·(id%4)-byte gap (even, zero-filled) so decoders
    * that hardcode offset 54 read garbage — ours honors bfOffBits. */
  def synth(docId: Long, text: UTF8String): Array[Byte] = {
    val len = text.getBytes.length
    val w = (2 + docId % 6).toInt
    val h = (1 + docId % 4).toInt
    val seed = 31 * docId + 7 * len
    val gap = (2 * (docId % 4)).toInt
    val stride = ((3 * w + 3) / 4) * 4
    val pixOff = 54 + gap
    val total = pixOff + stride * h
    val out = new Array[Byte](total)
    def put16(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte }
    def put32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte }
    out(0) = 'B'; out(1) = 'M'
    put32(2, total); put32(6, 0); put32(10, pixOff)
    put32(14, 40); put32(18, w); put32(22, h) // positive = bottom-up
    put16(26, 1); put16(28, 24); put32(30, 0) // planes, bpp, BI_RGB
    put32(34, stride * h); put32(38, 2835); put32(42, 2835)
    put32(46, 0); put32(50, 0)
    var y = 0
    while (y < h) { // y = logical row from top; stored row = h-1-y
      val row = pixOff + (h - 1 - y) * stride
      var x = 0
      while (x < w) {
        val p = y * w + x
        val o = row + 3 * x
        out(o) = ((seed + 3 * p) % 256).toByte
        out(o + 1) = ((seed + 3 * p + 1) % 256).toByte
        out(o + 2) = ((seed + 3 * p + 2) % 256).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- expressions ----

  case class BmpStats(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case _: BinaryType | NullType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary input, got ${other.simpleString}")
    }
    override def dataType: DataType = statsType
    override def nullable: Boolean = true // malformed bytes parse to NULL
    override def prettyName: String = "bmp_stats"

    override protected def nullSafeEval(input: Any): Any =
      Bmp.stats(input.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.functions.Bmp.stats($c);
        ${ev.isNull} = ${ev.value} == null;""")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class BmpSynth(left: Expression, right: Expression) extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (LongType, _: StringType) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (bigint, string), got $other")
      }
    override def dataType: DataType = BinaryType
    override def prettyName: String = "bmp_synth"

    override protected def nullSafeEval(id: Any, text: Any): Any =
      Bmp.synth(id.asInstanceOf[Long], text.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.Bmp.synth($a, $b);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def bmpStats(content: Column): Column =
    GraftBridge.column(BmpStats(GraftBridge.expression(content)))

  def bmpSynth(docId: Column, text: Column): Column =
    GraftBridge.column(BmpSynth(
      GraftBridge.expression(docId), GraftBridge.expression(text)))
}
