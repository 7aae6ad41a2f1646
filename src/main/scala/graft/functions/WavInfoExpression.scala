package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** WAV (RIFF/WAVE) header sniffing — the audio counterpart of
  * [[ImageDimsSupport]]: sample rate, channels, bit depth, and sample
  * count live in the `fmt ` and `data` chunk headers; a chunk walk reads
  * them without any audio codec. Returns null for non-WAV payloads.
  */
object WavInfoSupport {

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t(0) && b(i + 1) == t(1) && b(i + 2) == t(2) && b(i + 3) == t(3)

  /** (sampleRate, channels, bitsPerSample, nSamples) or null. */
  def parse(b: Array[Byte]): (Int, Int, Int, Long) = {
    if (b == null || b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return null
    var sr, ch, bits = -1
    var dataSize = -1L
    var pos = 12
    while (pos + 8 <= b.length) {
      val size = le32(b, pos + 4)
      if (tag(b, pos, "fmt ") && pos + 24 <= b.length) {
        ch = le16(b, pos + 10)
        sr = le32(b, pos + 12).toInt
        bits = le16(b, pos + 22)
      } else if (tag(b, pos, "data")) {
        dataSize = size
      }
      // chunks are word-aligned; a declared size may exceed the payload we
      // were handed (header-only sniffing) — the loop ends naturally then.
      // A corrupt size must not overflow Int (a negative advance would
      // loop forever): bail once the next position can't fit in the
      // payload anyway.
      val advance = 8L + size + (size & 1L)
      if (pos + advance > b.length) pos = b.length
      else pos += advance.toInt
    }
    // bits must be a positive multiple of 8: 4-bit ADPCM and other sub-byte
    // depths would make the block size 0 and divide by zero below.
    if (sr <= 0 || ch <= 0 || bits <= 0 || (bits & 7) != 0 || dataSize < 0) return null
    val blockBytes = ch.toLong * (bits / 8)
    (sr, ch, bits, dataSize / blockBytes)
  }

  def parseRow(b: Array[Byte]): InternalRow = {
    val p = parse(b)
    if (p == null) null
    else new GenericInternalRow(Array[Any](p._1, p._2, p._3, p._4))
  }
}

/** binary → struct<sample_rate int, channels int, bits int, n_samples long>
  * (null when not a RIFF/WAVE payload). Codegen-native.
  */
case class WavInfo(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits", IntegerType),
    StructField("n_samples", LongType)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"WavInfo expects binary, got $other")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else WavInfoSupport.parseRow(v.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.InternalRow ${ev.value} = null;
        if (!${childGen.isNull}) {
          ${ev.value} = graft.functions.WavInfoSupport.parseRow(${childGen.value});
          ${ev.isNull} = (${ev.value} == null);
        }""")
  }

  override protected def withNewChildInternal(newChild: Expression): WavInfo =
    copy(child = newChild)
}

object WavInfoExpressions {
  def wavInfo(content: Column): Column =
    ColumnBridge.column(WavInfo(ColumnBridge.expression(content)))
}
