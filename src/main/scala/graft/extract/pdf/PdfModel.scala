package graft.extract.pdf

/** PDF object model — the minimal COS subset the north-rule parser needs
  * (SURVEY.md §2.4 X1: xref/trailer parse, object + object-stream decode,
  * FlateDecode, content-stream tokenizer, text-run assembly). */
sealed trait PObj
case object PNull extends PObj
final case class PBool(b: Boolean) extends PObj
final case class PNum(d: Double) extends PObj { def toInt: Int = d.toInt; def toLong: Long = d.toLong }
final case class PStr(bytes: Array[Byte]) extends PObj {
  /** PDF simple-font strings decode 1:1 byte→char (Latin-1 superset view of
    * StandardEncoding — adequate for the ASCII corpus; CID fonts out of scope). */
  def text: String = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
}
final case class PName(s: String) extends PObj
final case class PArr(items: Vector[PObj]) extends PObj
final case class PDict(m: Map[String, PObj]) extends PObj {
  def get(k: String): Option[PObj] = m.get(k)
}
final case class PStream(dict: PDict, raw: Array[Byte]) extends PObj
final case class PRef(num: Int, gen: Int) extends PObj

final class PdfParseException(msg: String) extends Exception(msg)
