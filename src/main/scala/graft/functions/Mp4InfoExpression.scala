package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MP4 (ISO-BMFF) container sniffing — the video leg of the multimodal
  * metadata triad ([[ImageDimsSupport]] images, [[WavInfoSupport]] audio):
  * brand, duration, and track dimensions live in the `ftyp`, `moov/mvhd`,
  * and `moov/trak/tkhd` box headers; a box walk reads them with no codec.
  * Handles both version-0 (32-bit times) and version-1 (64-bit times)
  * mvhd/tkhd layouts. Returns null for anything that is not an MP4, and
  * never throws on hostile input (every read is bounds-checked; declared
  * box sizes are clamped to the payload).
  */
object Mp4InfoSupport {

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) | ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    i + 4 <= b.length &&
      b(i) == t(0) && b(i + 1) == t(1) && b(i + 2) == t(2) && b(i + 3) == t(3)

  /** (brand, timescale, durationMs, width, height) or null. */
  def parse(b: Array[Byte]): (String, Int, Long, Int, Int) = {
    if (b == null || b.length < 16) return null
    // first box must be ftyp; its payload starts with the major brand
    val ftypSize = be32(b, 0)
    if (!tag(b, 4, "ftyp") || ftypSize < 16 || ftypSize > b.length) return null
    val brand = new String(b, 8, 4, "US-ASCII")

    var timescale = -1
    var duration = -1L
    var width = -1
    var height = -1

    // child-box walk over [from, to); returns the next position or `to`
    def walk(from: Long, to: Long)(onBox: (String, Long, Long) => Unit): Unit = {
      var pos = from
      while (pos + 8 <= to) {
        var size: Long = be32(b, pos.toInt)
        var hdr = 8L
        if (size == 1) { // 64-bit largesize variant
          if (pos + 16 > to) return
          size = be64(b, pos.toInt + 8); hdr = 16L
        } else if (size == 0) size = to - pos // box extends to end of parent
        if (size < hdr) return // corrupt size — stop walking, keep what we have
        val tpe = new String(b, pos.toInt + 4, 4, "US-ASCII")
        val end = math.min(pos + size, to)
        onBox(tpe, pos + hdr, end)
        pos += size
      }
    }

    walk(ftypSize, b.length) { (t1, s1, e1) =>
      if (t1 == "moov") walk(s1, e1) { (t2, s2, e2) =>
        if (t2 == "mvhd" && timescale < 0 && s2 + 4 <= e2) {
          val v = b(s2.toInt) & 0xff
          if (v == 1 && s2 + 32 <= e2) {
            timescale = be32(b, s2.toInt + 20).toInt
            duration = be64(b, s2.toInt + 24)
          } else if (v == 0 && s2 + 20 <= e2) {
            timescale = be32(b, s2.toInt + 12).toInt
            duration = be32(b, s2.toInt + 16)
          }
        } else if (t2 == "trak" && width < 0) walk(s2, e2) { (t3, s3, e3) =>
          if (t3 == "tkhd" && width < 0 && s3 + 4 <= e3) {
            val v = b(s3.toInt) & 0xff
            // width offset within the payload: v0 = 4+4+4+4+4+4 +8+8+36 = 76;
            // v1's 64-bit ctime/mtime/duration add 12 bytes = 88
            val off = if (v == 1) 88L else 76L
            if (s3 + off + 8 <= e3) {
              val w = (be32(b, (s3 + off).toInt) >> 16).toInt // 16.16 fixed point
              val h = (be32(b, (s3 + off + 4).toInt) >> 16).toInt
              if (w > 0 && h > 0) { width = w; height = h }
            }
          }
        }
      }
    }

    if (timescale <= 0 || duration < 0) return null
    val durationMs = duration * 1000L / timescale
    (brand, timescale, durationMs, width, height)
  }

  def parseRow(b: Array[Byte]): InternalRow = {
    val p = parse(b)
    if (p == null) null
    else new GenericInternalRow(Array[Any](
      UTF8String.fromString(p._1), p._2, p._3,
      if (p._4 > 0) p._4 else null,
      if (p._5 > 0) p._5 else null))
  }
}

/** binary → struct<brand string, timescale int, duration_ms long,
  * width int, height int> (width/height null when no visual track; whole
  * struct null when not an MP4). Codegen-native.
  */
case class Mp4Info(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("brand", StringType),
    StructField("timescale", IntegerType),
    StructField("duration_ms", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"Mp4Info expects binary, got $other")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else Mp4InfoSupport.parseRow(v.asInstanceOf[Array[Byte]])
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
          ${ev.value} = graft.functions.Mp4InfoSupport.parseRow(${childGen.value});
          ${ev.isNull} = (${ev.value} == null);
        }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Mp4Info =
    copy(child = newChild)
}

object Mp4InfoExpressions {
  def mp4Info(content: Column): Column =
    ColumnBridge.column(Mp4Info(ColumnBridge.expression(content)))
}
