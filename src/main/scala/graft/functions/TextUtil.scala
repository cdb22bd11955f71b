package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Runtime helpers for the text expressions (called from generated
  * code — keep signatures static-friendly).
  */
object TextUtil {

  /** Unicode NFC normalization with an ASCII fast path: when every
    * char is one byte (numBytes == numChars) the string is pure ASCII
    * and NFC is the identity, so the dominant case on web/corpus text
    * skips the UTF8String→String→UTF8String round-trip entirely.
    */
  def nfc(s: UTF8String): UTF8String = {
    if (s.numBytes == s.numChars) return s
    val j = s.toString
    if (java.text.Normalizer.isNormalized(j, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(j, java.text.Normalizer.Form.NFC))
  }
}
