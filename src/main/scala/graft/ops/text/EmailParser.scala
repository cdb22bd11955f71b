package graft.ops.text

/** Native-JVM text parsing (SURVEY §2.11 M1/M2, §2.1 S3).
  *
  * The reference does this with Python `email.Parser` + BeautifulSoup +
  * chardet inside a PySpark UDF (`Assignment 4.py:104-122, 402-434`) —
  * every row crosses the JVM↔Python boundary twice. Here the parsers are
  * small pure-Scala functions used from Scala UDFs: rows never leave the
  * executor JVM and the surrounding projections stay codegen'd.
  */
object EmailParser {

  /** The reference's 19 output columns (`Assignment 4.py:42-62`), `-`
    * normalized to `_` (P6) — `Message_D` is the reference's own
    * spelling for Message-ID, kept for parity.
    */
  case class ParsedEmail(
      payload: Option[String], text: Option[String],
      Message_D: Option[String], Date: Option[String],
      From: Option[String], To: Option[String], Subject: Option[String],
      Mime_Version: Option[String], Content_Type: Option[String],
      Content_Transfer_Encoding: Option[String], X_From: Option[String],
      X_To: Option[String], X_cc: Option[String], X_bcc: Option[String],
      X_Folder: Option[String], X_Origin: Option[String],
      X_FileName: Option[String], Cc: Option[String], Bcc: Option[String])

  /** RFC-2822-style header block parse: `Name: value` lines up to the
    * first blank line, folded continuation lines (leading whitespace)
    * appended. Returns (headers lowercased-key map, body).
    */
  def splitMessage(raw: String): (Map[String, String], String) = {
    val lines = raw.split("\r?\n", -1)
    val headers = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var lastKey: String = null
    var i = 0
    var done = false
    while (i < lines.length && !done) {
      val line = lines(i)
      if (line.isEmpty) { done = true }
      else if ((line.charAt(0) == ' ' || line.charAt(0) == '\t') &&
        lastKey != null) {
        headers(lastKey) = headers(lastKey) + " " + line.trim
        i += 1
      } else {
        val c = line.indexOf(':')
        if (c > 0) {
          lastKey = line.substring(0, c).trim.toLowerCase
          headers(lastKey) = line.substring(c + 1).trim
          i += 1
        } else done = true // not a header line: body starts here
      }
    }
    val bodyStart = if (done && i < lines.length && lines(i).isEmpty) i + 1 else i
    (headers.toMap, lines.drop(bodyStart).mkString("\n"))
  }

  /** RFC 2045 boundary parameter of a Content-Type value. */
  def boundaryOf(contentType: String): Option[String] =
    "(?i)boundary\\s*=\\s*(?:\"([^\"]*)\"|([^;\\s]+))".r
      .findFirstMatchIn(contentType)
      .map(m => Option(m.group(1)).getOrElse(m.group(2)))

  /** Quoted-printable decode (soft line breaks removed, =XX bytes),
    * then charset-sniffed to a string.
    */
  def decodeQuotedPrintable(s: String): String = {
    val in = s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val out = new java.io.ByteArrayOutputStream(in.length)
    def hex(b: Byte): Int = Character.digit(b.toChar, 16)
    var i = 0
    while (i < in.length) {
      val b = in(i)
      if (b == '=' && i + 1 < in.length && in(i + 1) == '\n') i += 2
      else if (b == '=' && i + 2 < in.length && in(i + 1) == '\r' &&
        in(i + 2) == '\n') i += 3
      else if (b == '=' && i + 2 < in.length && hex(in(i + 1)) >= 0 &&
        hex(in(i + 2)) >= 0) {
        out.write(hex(in(i + 1)) * 16 + hex(in(i + 2))); i += 3
      } else { out.write(b.toInt); i += 1 }
    }
    decodeBest(out.toByteArray)
  }

  /** Apply a part's Content-Transfer-Encoding (7bit/8bit pass through,
    * quoted-printable and base64 decode — `get_content()` semantics).
    */
  def decodeTransfer(body: String, enc: Option[String]): String =
    enc.map(_.trim.toLowerCase).getOrElse("") match {
      case "base64" =>
        try decodeBest(java.util.Base64.getMimeDecoder
          .decode(body.replaceAll("\\s", "")))
        catch { case _: IllegalArgumentException => body }
      case "quoted-printable" => decodeQuotedPrintable(body)
      case _ => body
    }

  /** M1 multipart walk: decoded leaf part bodies, in order. A
    * multipart Content-Type splits the body on its boundary lines
    * (`--boundary` … `--boundary--`), parses each part's own header
    * block, and recurses (nested multiparts flatten); leaves decode per
    * their Content-Transfer-Encoding. Non-multipart yields the one
    * decoded body. Matches the reference's intended `get_payload()`
    * walk (`Assignment 4.py:415-421` — its own walk loses all but the
    * last part to a typo and never strips per part).
    */
  def partBodies(headers: Map[String, String], body: String): Seq[String] = {
    val bnd = headers.get("content-type")
      .filter(_.toLowerCase.startsWith("multipart"))
      .flatMap(boundaryOf)
    bnd match {
      case None =>
        Seq(decodeTransfer(body, headers.get("content-transfer-encoding")))
      case Some(b) =>
        val delim = "--" + b
        val parts = scala.collection.mutable.ArrayBuffer.empty[String]
        var cur: StringBuilder = null
        var ended = false
        for (line <- body.split("\r?\n", -1) if !ended) {
          val t = line.trim
          if (t == delim + "--") {
            if (cur != null) parts += cur.result(); cur = null; ended = true
          } else if (t == delim) {
            if (cur != null) parts += cur.result()
            cur = new StringBuilder
          } else if (cur != null) {
            if (cur.nonEmpty) cur += '\n'
            cur ++= line
          }
        }
        if (cur != null) parts += cur.result()
        parts.toSeq.flatMap { p =>
          val (ph, pb) = splitMessage(p)
          partBodies(ph, pb)
        }
    }
  }

  /** M1 intended semantics: parse headers + body; `text` is the
    * HTML-stripped concatenation of the decoded (multipart-walked) leaf
    * parts; `payload` keeps the raw top-level body.
    */
  def parseEmail(raw: String): ParsedEmail = {
    if (raw == null) return ParsedEmail(None, None, None, None, None, None,
      None, None, None, None, None, None, None, None, None, None, None,
      None, None)
    val (h, body) = splitMessage(raw.trim)
    def g(k: String): Option[String] = h.get(k)
    ParsedEmail(
      payload = Some(body),
      text = Some(partBodies(h, body).map(HtmlStrip.stripHtml)
        .mkString("\n")),
      Message_D = g("message-id"),
      Date = g("date"),
      From = g("from"),
      To = g("to"),
      Subject = g("subject"),
      Mime_Version = g("mime-version"),
      Content_Type = g("content-type"),
      Content_Transfer_Encoding = g("content-transfer-encoding"),
      X_From = g("x-from"),
      X_To = g("x-to"),
      X_cc = g("x-cc"),
      X_bcc = g("x-bcc"),
      X_Folder = g("x-folder"),
      X_Origin = g("x-origin"),
      X_FileName = g("x-filename"),
      Cc = g("cc"),
      Bcc = g("bcc"))
  }

  /** S3: charset-sniffing decode — BOM first (UTF-8/UTF-16 LE/BE), then
    * a null-byte distribution sniff for BOM-less UTF-16 (chardet's
    * strongest non-BOM signal: ASCII-heavy UTF-16 text has ~half its
    * bytes 0x00, parked on one parity), then strict UTF-8, then the
    * East-Asian multibyte family — Shift-JIS (full-width gate), EUC-JP
    * (kana-fraction gate), EUC-KR (hangul-gated), Shift-JIS again
    * (half-width kana admitted), Big5 (CJK-gated, no kana/hangul) — each
    * requiring strict structural decode PLUS script-block payoff,
    * then the Cyrillic single-byte family (KOI8-R vs windows-1251,
    * told apart by case-band distribution — the same signal chardet's
    * distribution models key on), then Latin-1 (total: every byte
    * sequence decodes). The reference uses chardet
    * (`Assignment 4.py:104-122`); this covers the encodings mail
    * corpora actually hit without the dependency.
    */
  def decodeBest(bytes: Array[Byte]): String = {
    if (bytes == null) return null
    import java.nio.charset.StandardCharsets._
    def is(b: Int, v: Int) = bytes.length > b && (bytes(b) & 0xff) == v
    if (is(0, 0xef) && is(1, 0xbb) && is(2, 0xbf))
      return new String(bytes, 3, bytes.length - 3, UTF_8)
    if (is(0, 0xff) && is(1, 0xfe))
      return new String(bytes, 2, bytes.length - 2, UTF_16LE)
    if (is(0, 0xfe) && is(1, 0xff))
      return new String(bytes, 2, bytes.length - 2, UTF_16BE)
    if (bytes.length >= 4) {
      val n = math.min(bytes.length, 4096)
      var evenNul = 0; var oddNul = 0; var i = 0
      while (i < n) {
        if (bytes(i) == 0) { if (i % 2 == 0) evenNul += 1 else oddNul += 1 }
        i += 1
      }
      // one parity nearly all NUL, the other nearly none → UTF-16
      if (oddNul * 3 > n && evenNul * 20 < n)
        return new String(bytes, UTF_16LE)
      if (evenNul * 3 > n && oddNul * 20 < n)
        return new String(bytes, UTF_16BE)
    }
    try {
      val dec = UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    } catch {
      case _: java.nio.charset.CharacterCodingException =>
        // East-Asian multibyte codecs BEFORE the Cyrillic band sniff:
        // EUC lead/trail bytes land inside the 0xC0+ letter bands the
        // Cyrillic heuristic keys on, but the multibyte tries demand
        // strict structural decode PLUS script-block payoff (high
        // precision), so they must get first claim.
        //
        // The SJIS/EUC order is the hard case: the 0xA1-0xDF band is
        // single-byte half-width katakana in SJIS but lead/trail bytes
        // in the EUC family, so byte runs inside it decode "validly"
        // both ways and only distribution separates them. The stream
        // is strict-decoded under SJIS ONCE; whether that succeeded is
        // also the ambiguity signal the EUC gates key on. Claim order:
        //   1. SJIS gated on FULL-WIDTH payoff (half-width kana don't
        //      count): claims ordinary Japanese mail immediately and
        //      can never be fooled by an EUC stream, whose SJIS
        //      misread is half-width-kana mojibake.
        //   2. EUC-JP. When the bytes ALSO decode under SJIS there is
        //      a live half-width-kana reading to out-compete, so kana
        //      must be >= 20% of the payload (real Japanese is
        //      hiragana-heavy; an SJIS kana stream misread as EUC-JP
        //      yields kana only from pairs led by 0xA4/0xA5, far
        //      below the bar). When SJIS already REJECTED the bytes
        //      there is no competing claim, and any kana suffices —
        //      kanji-dominant Japanese (addresses, name lists) keeps
        //      its decode.
        //   3. EUC-KR, same two-level bar: 70% hangul against a live
        //      SJIS reading (a dotted kana line measured 50% hangul),
        //      50% otherwise (hanja-heavy Korean keeps its decode).
        //   4. SJIS again with half-width kana COUNTING — catches the
        //      genuine old-mobile kana-only mail the step-1 gate
        //      deliberately skipped, now that both EUC codecs have had
        //      their claim.
        val sjis = strictDecode(bytes, "Shift_JIS")
        val contested = sjis.isDefined
        sjis.filter(sjisFullWidthGate)
          .orElse(tryEucJp(bytes, contested))
          .orElse(tryEucKr(bytes, contested))
          .orElse(sjis.filter(sjisAnyGate))
          .orElse(tryBig5(bytes))
          .orElse(tryCyrillic(bytes))
          .getOrElse(new String(bytes, ISO_8859_1))
    }
  }

  /** Shift-JIS FULL-WIDTH gate (claim step 1, see decodeBest): >= 80%
    * of the non-ASCII payload must be Japanese EXCLUDING half-width
    * katakana (U+FF61-FF9F). Structural validity alone is too weak —
    * stray Latin-1 accents often form valid lead+trail pairs — and
    * half-width kana are excluded because they are exactly what an EUC
    * byte stream misreads as: counting them would let this gate steal
    * EUC-JP/EUC-KR mail (every EUC pair in 0xA1-0xDF is two "valid"
    * SJIS kana singles).
    */
  private def sjisFullWidthGate(s: String): Boolean = {
    val na = nonAscii(s)
    na.nonEmpty &&
      na.count(c => isJapaneseBlock(c) && !isHalfWidthKana(c)) * 10 >=
        na.length * 8
  }

  /** Shift-JIS permissive gate (claim step 4): the original
    * kana-inclusive rule, applied only after both EUC codecs declined —
    * claims genuine half-width-katakana mail (old-mobile style)
    * without giving SJIS first pick of ambiguous EUC bytes.
    */
  private def sjisAnyGate(s: String): Boolean = {
    val na = nonAscii(s)
    na.nonEmpty && na.count(isJapaneseBlock) * 10 >= na.length * 8
  }

  /** Strict decode in `cs`; Some(text) only when the decode succeeds
    * AND `accept` approves the non-ASCII payload — the shared shape of
    * every East-Asian try (structural validity alone is too weak:
    * these encodings overlap byte-structurally, so the script-block
    * distribution is what disambiguates, exactly the signal chardet's
    * per-codec distribution models encode).
    */
  private def tryStrict(bytes: Array[Byte], cs: String)(
      accept: String => Boolean): Option[String] =
    strictDecode(bytes, cs).filter(accept)

  /** Strict decode only — Some(text) iff every byte sequence is valid
    * and mappable in `cs`; gates apply separately so one decode can
    * serve several (decodeBest's SJIS is gated twice).
    */
  private def strictDecode(bytes: Array[Byte], cs: String): Option[String] =
    try {
      val dec = java.nio.charset.Charset.forName(cs).newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      Some(dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
    } catch {
      case _: java.nio.charset.CharacterCodingException => None
      // jlink-minimized runtimes may omit jdk.charsets (home of the
      // East-Asian codecs); decodeBest's contract is total — degrade
      // to the next try, never crash the parse job
      case _: java.nio.charset.UnsupportedCharsetException => None
    }

  private def nonAscii(s: String): String = s.filter(_ >= 0x80)

  private def isJapaneseBlock(c: Char): Boolean =
    (c >= 0x3040 && c <= 0x30ff) || (c >= 0x4e00 && c <= 0x9fff) ||
      (c >= 0xff00 && c <= 0xffef) || (c >= 0x3000 && c <= 0x303f)

  private def isKana(c: Char): Boolean = c >= 0x3040 && c <= 0x30ff

  private def isHalfWidthKana(c: Char): Boolean =
    c >= 0xff61 && c <= 0xff9f

  private def isHangul(c: Char): Boolean =
    (c >= 0xac00 && c <= 0xd7a3) || (c >= 0x1100 && c <= 0x11ff) ||
      (c >= 0x3130 && c <= 0x318f)

  /** EUC-JP: strict decode + Japanese payload + kana. The kana bar is
    * TWO-LEVEL on `contested` (= the same bytes also strict-decode
    * under SJIS, so a half-width-katakana reading is live): contested
    * streams need kana >= 20% of the non-ASCII payload — real Japanese
    * is hiragana-heavy, while genuine SJIS kana mail misread as EUC-JP
    * yields kana only from pairs led by 0xA4/0xA5 ('､'/'･'), far below
    * the bar (a bare `exists(isKana)` was measured claimable by one
    * stray '･'). Uncontested streams (SJIS already rejected the bytes)
    * have no competing claim, and ANY kana suffices — kanji-dominant
    * Japanese (addresses, name lists) keeps its decode. The kana
    * requirement itself also disambiguates against EUC-KR: hangul rows
    * decoded as EUC-JP yield structurally-valid kanji but no kana.
    */
  private def tryEucJp(bytes: Array[Byte], contested: Boolean): Option[String] =
    tryStrict(bytes, "EUC-JP") { s =>
      val na = nonAscii(s)
      na.nonEmpty && na.count(isJapaneseBlock) * 10 >= na.length * 8 &&
        (if (contested) na.count(isKana) * 5 >= na.length
         else na.exists(isKana))
    }

  /** EUC-KR: strict decode + hangul-dominant payload, two-level on
    * `contested` like [[tryEucJp]]: against a live SJIS reading the
    * bar is 70% hangul (SJIS half-width-kana runs whose even-length
    * byte pairs lead in 0xB0-0xC8 decode as structurally-valid hangul
    * — a dotted kana address line measured 50%), otherwise 50% (hanja-
    * heavy academic/legal Korean keeps its decode when no SJIS claim
    * exists). Tried after EUC-JP's kana gate, so kana-bearing Japanese
    * never falls here. Residual ambiguity is inherent: a short
    * pure-kana run whose pairs ALL land in hangul rows is
    * byte-identical to real EUC-KR, and only a frequency model
    * (chardet's) could split it — this sniffer sides with EUC-KR
    * there, trading the rarer kana-only-mail shape.
    */
  private def tryEucKr(bytes: Array[Byte], contested: Boolean): Option[String] =
    tryStrict(bytes, "EUC-KR") { s =>
      val na = nonAscii(s)
      na.nonEmpty &&
        na.count(isHangul) * 10 >= na.length * (if (contested) 7 else 5)
    }

  /** Big5: strict decode + CJK/bopomofo payload with NO kana and NO
    * hangul (Big5 trail bytes 0x40-0x7E fail strict EUC decodes, so
    * real Big5 usually only reaches here; the negative gates stop
    * EUC-KR/EUC-JP byte streams that happen to form valid Big5 from
    * misdetecting).
    */
  private def tryBig5(bytes: Array[Byte]): Option[String] =
    tryStrict(bytes, "Big5") { s =>
      val na = nonAscii(s)
      val cjk = na.count { c =>
        (c >= 0x4e00 && c <= 0x9fff) || (c >= 0x3100 && c <= 0x312f) ||
          (c >= 0xff00 && c <= 0xffef) || (c >= 0x3000 && c <= 0x303f)
      }
      na.nonEmpty && cjk * 10 >= na.length * 8 &&
        !na.exists(isKana) && !na.exists(isHangul)
    }

  /** KOI8-R / windows-1251: both map the 0xC0-0xFF band to Cyrillic
    * letters, so "dense high bytes, nearly all in the letter bands"
    * identifies the family; the two are told apart by WHERE running
    * text's lowercase mass sits — KOI8-R puts lowercase in 0xC0-0xDF,
    * cp1251 in 0xE0-0xFF (exactly inverted).
    */
  private def tryCyrillic(bytes: Array[Byte]): Option[String] = {
    val high = bytes.filter(b => (b & 0x80) != 0).map(_ & 0xff)
    if (high.length < 8 || high.length * 4 < bytes.length) return None
    val letters = high.count(b => b >= 0xc0 ||
      b == 0xa3 || b == 0xb3 || // KOI8 ё/Ё
      b == 0xb8 || b == 0xa8)   // cp1251 ё/Ё
    if (letters * 10 < high.length * 9) return None
    val loBand = high.count(b => b >= 0xc0 && b <= 0xdf)
    val hiBand = high.count(b => b >= 0xe0)
    val cs = if (loBand >= hiBand) "KOI8-R" else "windows-1251"
    Some(new String(bytes, java.nio.charset.Charset.forName(cs)))
  }
}

/** M2: HTML → text, replacing BeautifulSoup.get_text()
  * (`Assignment 4.py:402-409`): drop tags/comments, drop
  * script/style content, decode entities. Plain text passes through
  * unchanged (same as bs4 on non-HTML input).
  */
object HtmlStrip {

  private val namedEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "copy" -> "©",
    "reg" -> "®", "trade" -> "™", "mdash" -> "—",
    "ndash" -> "–", "hellip" -> "…")

  def decodeEntities(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val name = s.substring(i + 1, semi)
          if (name.startsWith("#")) {
            val num = name.substring(1)
            val cp = try {
              if (num.startsWith("x") || num.startsWith("X"))
                Integer.parseInt(num.substring(1), 16)
              else Integer.parseInt(num)
            } catch { case _: NumberFormatException => -1 }
            if (cp >= 0 && Character.isValidCodePoint(cp)) {
              sb.appendCodePoint(cp); i = semi + 1
            } else { sb.append(c); i += 1 }
          } else namedEntities.get(name.toLowerCase) match {
            case Some(rep) => sb.append(rep); i = semi + 1
            case None => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Single-pass tag stripper: removes `<...>` spans (incl. multi-line
    * tags and `<!-- -->` comments), drops script/style bodies.
    */
  def stripHtml(s: String): String = {
    if (s == null) return null
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var skipUntil: String = null // closing tag whose content is dropped
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.regionMatches(i, "<!--", 0, 4)) {
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) s.length else end + 3
        } else {
          val end = s.indexOf('>', i + 1)
          if (end < 0) { i = s.length } // unterminated tag: bs4 drops it
          else {
            val tag = s.substring(i + 1, end).trim.toLowerCase
            val name = tag.takeWhile(ch => ch.isLetterOrDigit)
            if (skipUntil == null && (name == "script" || name == "style")
              && !tag.startsWith("/") && !tag.endsWith("/"))
              skipUntil = "/" + name
            else if (skipUntil != null && tag.startsWith(skipUntil))
              skipUntil = null
            i = end + 1
          }
        }
      } else {
        if (skipUntil == null) sb.append(c)
        i += 1
      }
    }
    decodeEntities(sb.toString)
  }
}
