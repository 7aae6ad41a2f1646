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

/** Container-header image dimension sniffing — the metadata half of a
  * multimodal pipeline that needs NO codec: PNG (IHDR), JPEG (marker walk
  * to SOF), and GIF (logical screen descriptor) carry width/height in
  * their headers. Byte-level parsing only; returns null for anything that
  * isn't a recognized image container.
  */
object ImageDimsSupport {

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) | ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  /** (format, width, height) or null when not a recognized image. */
  def parse(b: Array[Byte]): (String, Int, Int) = {
    if (b == null) return null
    // PNG: 8-byte signature, then IHDR chunk: length(4) type(4) W(4) H(4)
    if (b.length >= 24 &&
      (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      return ("png", be32(b, 16).toInt, be32(b, 20).toInt)
    // GIF87a/GIF89a: width/height little-endian at offsets 6/8
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8')
      return ("gif", le16(b, 6), le16(b, 8))
    // JPEG: SOI then marker segments; SOFn (C0-CF minus C4/C8/CC) carries
    // height at +5, width at +7 within the segment
    if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var pos = 2
      while (pos + 2 <= b.length && (b(pos) & 0xff) == 0xff) {
        // 0xFF fill/padding bytes may precede any marker — skip them
        while (pos + 2 <= b.length && (b(pos + 1) & 0xff) == 0xff) pos += 1
        if (pos + 2 > b.length) return null
        val marker = b(pos + 1) & 0xff
        if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          if (pos + 9 <= b.length) return ("jpeg", be16(b, pos + 7), be16(b, pos + 5))
          return null
        }
        if (marker == 0xd9 || marker == 0xda) return null // EOS before SOF
        // standalone markers (TEM 0x01, RST0-7 0xD0-0xD7) carry no length field
        if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) pos += 2
        else {
          if (pos + 4 > b.length) return null
          pos += 2 + be16(b, pos + 2)
        }
      }
    }
    null
  }

  /** InternalRow adapter for the expression: struct(format, width, height). */
  def parseRow(b: Array[Byte]): InternalRow = {
    val p = parse(b)
    if (p == null) null
    else new GenericInternalRow(Array[Any](UTF8String.fromString(p._1), p._2, p._3))
  }
}

/** binary → struct<format string, width int, height int> (null when the
  * payload is not a recognized PNG/JPEG/GIF). Codegen-native: generated
  * code calls the same parser as eval.
  */
case class ImageDims(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"ImageDims expects binary, got $other")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else ImageDimsSupport.parseRow(v.asInstanceOf[Array[Byte]])
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
          ${ev.value} = graft.functions.ImageDimsSupport.parseRow(${childGen.value});
          ${ev.isNull} = (${ev.value} == null);
        }""")
  }

  override protected def withNewChildInternal(newChild: Expression): ImageDims =
    copy(child = newChild)
}

object ImageDimsExpressions {
  def imageDims(content: Column): Column =
    ColumnBridge.column(ImageDims(ColumnBridge.expression(content)))
}
