package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{graftshim, Column}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL image codec expressions over binary columns — the JDK ships
  * `javax.imageio` (PNG/JPEG/GIF/BMP readers and writers), so the
  * multimodal decode step needs no external library:
  *
  *  - [[ImageMetaExpr]] decodes width/height/format from the image
  *    HEADER only (`ImageReader.getWidth/getHeight` never touch pixel
  *    data), so per-row cost is a few hundred header bytes, not a
  *    pixel decode — the right scale shape for metadata extraction
  *    over 100 TB of blobs. Undecodable bytes yield null, never throw
  *    (corrupt blobs are data, not errors).
  *  - [[SynthImageExpr]] renders a real PNG/JPEG of given dimensions
  *    with a deterministic pixel pattern — the distributed fixture
  *    generator that lets tests and oracles know each image's true
  *    metadata from its id alone (reference anchor for opaque-value
  *    handling: /root/reference/lib/json_tsv.js:92-149).
  *
  * Both are native codegen'd expressions (no row UDFs; PlanSpec gates
  * this). Audio/video decode stays a documented deterministic stub in
  * [[graft.ml.Multimodal]] — the JDK has no codec for those.
  */
case class ImageMetaExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got $t")
  }
  override def dataType: DataType = ImageMetaExpr.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_image_meta"

  protected override def nullSafeEval(input: Any): Any =
    ImageMetaExpr.meta(input.asInstanceOf[Array[Byte]])

  // meta() returns null for undecodable bytes even when the input is
  // non-null, so the generated code re-checks the result
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ImageMetaExpr.meta($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): ImageMetaExpr =
    copy(child = newChild)
}

object ImageMetaExpr {

  javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors

  val schema: StructType = StructType(Seq(
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** Header-only decode; null when no installed reader claims the
    * bytes (corrupt/unknown payloads are data, not exceptions). */
  def meta(bytes: Array[Byte]): InternalRow = {
    var iis: javax.imageio.stream.ImageInputStream = null
    try {
      iis = javax.imageio.ImageIO.createImageInputStream(
        new ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return null
      val r = readers.next()
      try {
        r.setInput(iis)
        InternalRow(bytes.length, r.getWidth(0), r.getHeight(0),
          UTF8String.fromString(r.getFormatName.toLowerCase(java.util.Locale.ROOT)))
      } finally r.dispose()
      // NonFatal only: an OOM or task-kill must FAIL the task (Spark
      // retries it) — swallowing it to null would silently corrupt
      // the batch's output
    } catch { case scala.util.control.NonFatal(_) => null }
    finally if (iis != null) iis.close()
  }

  def imageMeta(blob: Column): Column =
    graftshim.toColumn(ImageMetaExpr(graftshim.toExpression(blob)))
}

case class SynthImageExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (IntegerType, IntegerType, StringType) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (int, int, string), got $t")
    }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_synth_image"

  protected override def nullSafeEval(w: Any, h: Any, f: Any): Any =
    SynthImageExpr.encode(w.asInstanceOf[Int], h.asInstanceOf[Int], f.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, h, f) =>
      s"graft.functions.SynthImageExpr.encode($w, $h, $f.toString())")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): SynthImageExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object SynthImageExpr {

  /** Render a real `fmt` ("png"/"jpeg") image of w×h with a
    * deterministic gradient. Dimensions are clamped to [1, 4096] —
    * this is a fixture generator, not a DoS surface. */
  def encode(w: Int, h: Int, fmt: String): Array[Byte] = {
    val cw = math.min(math.max(w, 1), 4096)
    val ch = math.min(math.max(h, 1), 4096)
    val img = new java.awt.image.BufferedImage(
      cw, ch, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < ch) {
      var x = 0
      while (x < cw) { img.setRGB(x, y, (x * 31 + y * 17) & 0xFFFFFF); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    if (!javax.imageio.ImageIO.write(img, fmt, bos))
      throw new IllegalArgumentException(s"no JDK image writer for format $fmt")
    bos.toByteArray
  }

  def synthImage(w: Column, h: Column, fmt: Column): Column =
    graftshim.toColumn(SynthImageExpr(graftshim.toExpression(w),
      graftshim.toExpression(h), graftshim.toExpression(fmt)))
}
