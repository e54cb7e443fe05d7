package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Zero-copy CharSequence view over ASCII UTF8Strings.
  *
  * java.util.regex and our kv FSM only need CharSequence; converting every
  * row's text to String first allocates + copies the whole payload (the
  * single biggest garbage source in the parse stage — GC time on the
  * 32-thread legs). ASCII is the overwhelmingly common case for log
  * lines; non-ASCII falls back to toString.
  */
object Utf8Ascii {

  def charSeq(s: UTF8String): CharSequence = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) { if (s.getByte(i) < 0) ascii = false; i += 1 }
    if (ascii) new AsciiSeq(s, 0, n) else s.toString
  }

  final class AsciiSeq(s: UTF8String, start: Int, end: Int) extends CharSequence {
    override def length(): Int = end - start
    override def charAt(i: Int): Char = (s.getByte(start + i) & 0xff).toChar
    override def subSequence(a: Int, b: Int): CharSequence =
      new AsciiSeq(s, start + a, start + b)
    override def toString: String = {
      val sb = new java.lang.StringBuilder(end - start)
      var i = start
      while (i < end) { sb.append((s.getByte(i) & 0xff).toChar); i += 1 }
      sb.toString
    }
  }
}
