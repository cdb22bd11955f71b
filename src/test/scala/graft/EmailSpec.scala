package graft

import graft.ops.text.{EmailParser, HtmlStrip, ParseEmails}
import org.apache.spark.sql.functions._

/** M1-M6 against the reference's two inline golden messages
  * (`Assignment 4.py:228-394`, stored as test resources).
  */
class EmailSpec extends SparkTestBase {

  def fixture(name: String): String = {
    val in = getClass.getResourceAsStream(s"/$name.txt")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  lazy val plainMsg = fixture("plain_msg_example")
  lazy val htmlMsg = fixture("html_msg_example")

  test("plain golden: all 19 header/body fields") {
    val p = EmailParser.parseEmail(plainMsg)
    assert(p.Message_D.contains("<6742786.1075845426893.JavaMail.evans@thyme>"))
    assert(p.Date.contains("Thu, 7 Jun 2001 11:05:33 -0700 (PDT)"))
    assert(p.From.contains("jeffrey.hammad@enron.com"))
    assert(p.To.contains("andy.zipper@enron.com"))
    assert(p.Subject.contains("Thanks for the interview"))
    assert(p.Mime_Version.contains("1.0"))
    assert(p.Content_Type.contains("text/plain; charset=us-ascii"))
    assert(p.Content_Transfer_Encoding.contains("7bit"))
    assert(p.X_From.exists(_.startsWith("Hammad, Jeffrey")))
    assert(p.X_To.exists(_.startsWith("Zipper, Andy")))
    assert(p.X_cc.contains(""))
    assert(p.X_Folder.contains("\\Zipper, Andy\\Zipper, Andy\\Inbox"))
    assert(p.X_Origin.contains("ZIPPER-A"))
    assert(p.X_FileName.contains("Zipper, Andy.pst"))
    assert(p.text.exists(_.contains(
      "Thanks for giving me the opportunity to meet with you")))
    assert(p.payload == p.text) // no HTML in the plain message
  }

  test("html golden: text is tag-stripped, entity-decoded") {
    val p = EmailParser.parseEmail(htmlMsg)
    assert(p.From.contains("insynconline.6jy5ympb.d@insync-palm.com"))
    assert(p.Subject.contains("Last chance for special offer on Palm OS Upgrade!"))
    val text = p.text.get
    assert(!text.contains("<"), "tags must be stripped")
    assert(text.contains("Dear THERESA"))
    assert(text.contains("Palm OS® v4.1 Upgrade")) // &#174; decoded
    assert(text.contains("Copyright© 2001 Palm, Inc.")) // &#169; decoded
    assert(p.payload.get.contains("<html>")) // payload keeps raw body
  }

  test("multipart MIME: boundary split, per-part decode, concatenated text") {
    // multipart fixture built from the html golden's body wrapped in a
    // boundary, plus a base64 and a quoted-printable plain part
    val htmlBody = EmailParser.splitMessage(htmlMsg.trim)._2
    val b64 = java.util.Base64.getEncoder.encodeToString(
      "binary-decoded part".getBytes("UTF-8"))
    val msg =
      s"""Message-ID: <multi@x>
         |From: multi@example.com
         |Subject: multipart test
         |MIME-Version: 1.0
         |Content-Type: multipart/alternative; boundary="BNDRY42"
         |
         |preamble to be ignored
         |--BNDRY42
         |Content-Type: text/plain; charset=us-ascii
         |Content-Transfer-Encoding: quoted-printable
         |
         |qp caf=C3=A9 line=
         | continues
         |--BNDRY42
         |Content-Type: text/plain
         |Content-Transfer-Encoding: base64
         |
         |$b64
         |--BNDRY42
         |Content-Type: text/html
         |
         |$htmlBody
         |--BNDRY42--
         |epilogue to be ignored""".stripMargin
    val p = EmailParser.parseEmail(msg)
    val text = p.text.get
    assert(text.contains("qp café line continues"), "quoted-printable part")
    assert(text.contains("binary-decoded part"), "base64 part")
    assert(text.contains("Dear THERESA") && !text.contains("<html"),
      "html part must be walked and stripped")
    assert(!text.contains("BNDRY42") && !text.contains("preamble") &&
      !text.contains("epilogue"), "boundary markers must not leak into text")
    assert(p.payload.get.contains("--BNDRY42"), "payload keeps the raw body")
    // nested multipart flattens
    val nested =
      s"""Content-Type: multipart/mixed; boundary=outer
         |
         |--outer
         |Content-Type: multipart/alternative; boundary=inner
         |
         |--inner
         |
         |inner part one
         |--inner
         |
         |inner part two
         |--inner--
         |--outer
         |
         |outer part
         |--outer--""".stripMargin
    val (nh, nb) = EmailParser.splitMessage(nested)
    assert(EmailParser.partBodies(nh, nb) ==
      Seq("inner part one", "inner part two", "outer part"))
    // non-multipart messages are untouched by the walk
    assert(EmailParser.parseEmail(plainMsg).payload ==
      EmailParser.parseEmail(plainMsg).text)
  }

  test("header folding and missing headers") {
    val (h, body) = EmailParser.splitMessage(
      "Subject: a folded\n  subject line\nFrom: x@y\n\nbody here")
    assert(h("subject") == "a folded subject line")
    assert(h("from") == "x@y")
    assert(body == "body here")
    val p = EmailParser.parseEmail("From: a@b\n\nhi")
    assert(p.Bcc.isEmpty && p.Cc.isEmpty && p.To.isEmpty)
  }

  test("parser never throws on arbitrary bytes") {
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val junk = new String(Array.fill(rnd.nextInt(500))(
        (rnd.nextInt(90) + 32).toChar))
      EmailParser.parseEmail(junk) // must not throw
      HtmlStrip.stripHtml(junk)
    }
    assert(EmailParser.parseEmail(null).From.isEmpty)
    assert(HtmlStrip.stripHtml(null) == null)
  }

  test("charset sniffing: utf-8 strict, latin-1 fallback") {
    val utf8 = "héllo ☃".getBytes("UTF-8")
    assert(EmailParser.decodeBest(utf8) == "héllo ☃")
    val latin1 = "café".getBytes("ISO-8859-1")
    assert(EmailParser.decodeBest(latin1) == "café")
    // invalid utf-8 continuation byte: must not throw
    assert(EmailParser.decodeBest(Array(0x68, 0xE9, 0x21).map(_.toByte))
      == "hé!")
  }

  test("charset sniffing: BOMs and BOM-less UTF-16 detected") {
    import java.nio.charset.StandardCharsets._
    val s = "Hello, wörld — café"
    def bom(b: Array[Byte], payload: Array[Byte]) = b ++ payload
    assert(EmailParser.decodeBest(
      bom(Array(0xEF, 0xBB, 0xBF).map(_.toByte), s.getBytes(UTF_8))) == s)
    assert(EmailParser.decodeBest(
      bom(Array(0xFF, 0xFE).map(_.toByte), s.getBytes(UTF_16LE))) == s)
    assert(EmailParser.decodeBest(
      bom(Array(0xFE, 0xFF).map(_.toByte), s.getBytes(UTF_16BE))) == s)
    // BOM-less UTF-16: null-byte parity sniff (previously mojibake'd)
    assert(EmailParser.decodeBest("plain ascii text".getBytes(UTF_16LE))
      == "plain ascii text")
    assert(EmailParser.decodeBest("plain ascii text".getBytes(UTF_16BE))
      == "plain ascii text")
    // ascii/utf-8/latin-1 behavior unchanged
    assert(EmailParser.decodeBest(s.getBytes(UTF_8)) == s)
    assert(EmailParser.decodeBest("café".getBytes(ISO_8859_1)) == "café")
  }

  test("charset sniffing: Shift-JIS and the Cyrillic single-byte family") {
    val ja = "日本語のテキストです。こんにちは世界。"
    assert(EmailParser.decodeBest(ja.getBytes("Shift_JIS")) == ja)
    // mixed ascii + japanese, the common mail shape
    val mixed = s"Subject line: $ja (priority 1)"
    assert(EmailParser.decodeBest(mixed.getBytes("Shift_JIS")) == mixed)
    val ru = "Это письмо написано по-русски. Привет, мир!"
    assert(EmailParser.decodeBest(ru.getBytes("KOI8-R")) == ru)
    assert(EmailParser.decodeBest(ru.getBytes("windows-1251")) == ru)
    // sparse accents must stay Latin-1, not misread as SJIS/Cyrillic
    val fr = "café crème: déjà vu, naïveté, garçon"
    assert(EmailParser.decodeBest(fr.getBytes("ISO-8859-1")) == fr)
    // utf-8 Russian is still won by the strict utf-8 pass
    assert(EmailParser.decodeBest(ru.getBytes("UTF-8")) == ru)
  }

  test("charset sniffing: EUC-JP / EUC-KR / Big5 long tail, " +
    "cross-codec gates hold") {
    // Japanese with kana — the gate that separates EUC-JP from the
    // structurally-overlapping EUC-KR
    val ja = "日本語のテキストです。こんにちは世界。"
    assert(EmailParser.decodeBest(ja.getBytes("EUC-JP")) == ja)
    val jaMixed = s"Re: meeting notes $ja (resend)"
    assert(EmailParser.decodeBest(jaMixed.getBytes("EUC-JP")) == jaMixed)
    // Korean: hangul-dominant, must NOT be claimed by the EUC-JP try
    val ko = "안녕하세요 세계. 한국어 텍스트입니다."
    assert(EmailParser.decodeBest(ko.getBytes("EUC-KR")) == ko)
    val koMixed = s"Subject: $ko (urgent)"
    assert(EmailParser.decodeBest(koMixed.getBytes("EUC-KR")) == koMixed)
    // Traditional Chinese: CJK with no kana/hangul → Big5
    val zh = "這是一封用中文寫的電子郵件。你好世界。"
    assert(EmailParser.decodeBest(zh.getBytes("Big5")) == zh)
    // the earlier codecs keep their claims with the new tries present
    assert(EmailParser.decodeBest(ja.getBytes("Shift_JIS")) == ja)
    val ru = "Это письмо написано по-русски. Привет, мир!"
    assert(EmailParser.decodeBest(ru.getBytes("KOI8-R")) == ru)
    val fr = "café crème: déjà vu, naïveté, garçon"
    assert(EmailParser.decodeBest(fr.getBytes("ISO-8859-1")) == fr)
  }

  test("charset sniffing: EUC streams that survive strict SJIS decode " +
    "are not misclaimed as half-width katakana") {
    // Hiragana in EUC-JP is pairs of 0xA4 0xA2..0xF3 — every byte sits
    // in 0xA1-0xDF, which Shift_JIS reads as VALID single-byte
    // half-width katakana. A SJIS-first order decodes this as
    // kana-dominant mojibake that passes the Japanese-block gate; only
    // the EUC-JP-first order recovers the text.
    val jaKana = "あいうえおかきくけこさしすせそ"
    val jaBytes = jaKana.getBytes("EUC-JP")
    assert(jaBytes.forall(b => (b & 0xff) >= 0xa1 && (b & 0xff) <= 0xdf),
      "fixture must sit entirely in the SJIS half-width kana band")
    assert(EmailParser.decodeBest(jaBytes) == jaKana)
    // Same trap in Korean: these hangul syllables encode to EUC-KR
    // bytes entirely inside 0xA1-0xDF.
    val koLow = "가나다마바아자"
    val koBytes = koLow.getBytes("EUC-KR")
    assert(koBytes.forall(b => (b & 0xff) >= 0xa1 && (b & 0xff) <= 0xdf),
      "fixture must sit entirely in the SJIS half-width kana band")
    assert(EmailParser.decodeBest(koBytes) == koLow)
    // Real half-width katakana SJIS mail (old-mobile style) must STILL
    // decode as SJIS: its byte runs are structurally-valid EUC pairs,
    // but they decode to kanji-heavy text far below EUC-JP's
    // 20%-kana bar, so the claim falls to the permissive SJIS try.
    val hwKana = "ﾒｰﾙｱﾄﾞﾚｽ: ﾃｽﾄ ﾒｯｾｰｼﾞ"
    assert(EmailParser.decodeBest(hwKana.getBytes("Shift_JIS")) == hwKana)
    // the trap inside the trap: '･' (0xA5) leads an EVEN-offset pair,
    // and 0xA5-led EUC-JP pairs decode to REAL katakana — a bare
    // `exists(kana)` EUC gate claimed exactly this shape as mojibake;
    // the fraction gate must hand it back to SJIS
    val hwDotted = "ﾒｰﾙ･ｱﾄﾞﾚｽ､ﾃｽﾄ･ﾒﾓ"
    assert(EmailParser.decodeBest(hwDotted.getBytes("Shift_JIS")) == hwDotted)
    // full-width Japanese with a MINORITY of half-width kana still
    // claims on the first (full-width-gated) SJIS try
    val mixedWidth = "これは全角の文ですがﾒﾓも入る。こんにちは。"
    assert(EmailParser.decodeBest(mixedWidth.getBytes("Shift_JIS")) == mixedWidth)
    // UNCONTESTED streams (strict SJIS rejects the bytes, so no
    // half-width-kana reading competes) keep the original looser bars:
    // kanji-dominant Japanese at ~8% kana, and hanja-mixed Korean at
    // ~69% hangul, must both still decode — the contested-only
    // tightening may not cost either
    val jaKanji = "東京都港区芝公園の郵便番号"
    assert(EmailParser.decodeBest(jaKanji.getBytes("EUC-JP")) == jaKanji)
    val koHanja = "대한민국 헌법 제1조는 民主共和國이다"
    assert(EmailParser.decodeBest(koHanja.getBytes("EUC-KR")) == koHanja)
  }

  test("script/style content dropped, comments removed") {
    val s = "a<script>var x=1;</script>b<style>p{}</style>c<!-- hidden -->d"
    assert(HtmlStrip.stripHtml(s) == "abcd")
  }

  test("full pipeline: transformer + tokenizer + countvectorizer on goldens") {
    import spark.implicits._
    val df = Seq(
      ("hammad-j", "msg1", plainMsg),
      ("staab-t", "msg2", htmlMsg)
    ).toDF("username", "id", "original_msg")

    val model = ParseEmails.emailPipeline().fit(df)
    val result = model.transform(df)
    assert(result.columns.contains("words") &&
      result.columns.contains("features"))
    val rows = result.select("id", "words", "features").collect()
    assert(rows.length == 2)
    val words = rows.find(_.getString(0) == "msg1").get
      .getSeq[String](1)
    assert(words.contains("thanks")) // lowercased tokens
    val vec = rows.head.getAs[org.apache.spark.ml.linalg.Vector](2)
    assert(vec.numNonzeros > 0)
  }

  test("M11 capability: classifier trains on the featurization pipeline output") {
    import spark.implicits._
    import org.apache.spark.ml.classification.LogisticRegression
    // labels from username — the pipeline's features column feeds any
    // MLlib classifier (IMDB/news-classifier capability, SURVEY M11)
    val df = Seq(
      ("hammad-j", "m1", plainMsg), ("staab-t", "m2", htmlMsg),
      ("hammad-j", "m3", plainMsg + "\nextra line"),
      ("staab-t", "m4", htmlMsg + "\n<p>tail</p>")
    ).toDF("username", "id", "original_msg")
    val featured = ParseEmails.emailPipeline().fit(df).transform(df)
      .withColumn("label",
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.col("username") === "hammad-j", 0.0)
          .otherwise(1.0))
    val model = new LogisticRegression().setMaxIter(10).fit(featured)
    val acc = model.transform(featured)
      .filter(org.apache.spark.sql.functions.col("prediction") ===
        org.apache.spark.sql.functions.col("label")).count()
    assert(acc == 4, "separable 2x2 corpus must classify perfectly")
  }

  test("W6: fitted pipeline model persists and reloads") {
    import spark.implicits._
    val df = Seq(("u", "m", plainMsg)).toDF("username", "id", "original_msg")
    val model = ParseEmails.emailPipeline().fit(df)
    val dir = java.nio.file.Files.createTempDirectory("mdl").toString + "/m"
    // stages after the custom transformer are MLlib-persistable; the
    // transformer itself is stateless so persistence covers the models
    model.stages.collect {
      case m: org.apache.spark.ml.feature.CountVectorizerModel => m
    }.head.write.overwrite().save(dir)
    val back = org.apache.spark.ml.feature.CountVectorizerModel.load(dir)
    assert(back.vocabulary.nonEmpty)
  }

  test("maildir ingest: username/id derived from paths, charset-safe read") {
    val root = java.nio.file.Files.createTempDirectory("maildir")
    val sub = root.resolve("lay-k/inbox"); java.nio.file.Files.createDirectories(sub)
    java.nio.file.Files.write(sub.resolve("1."), plainMsg.getBytes("UTF-8"))
    java.nio.file.Files.write(sub.resolve("2."),
      "From: a@b\n\ncafé".getBytes("ISO-8859-1"))
    val df = ParseEmails.readMaildir(spark, root.toString)
    val rows = df.collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[String]("username") == "lay-k"))
    assert(rows.map(_.getAs[String]("id")).toSet ==
      Set("lay-k/inbox/1.", "lay-k/inbox/2."))
    val parsed = ParseEmails.parseEmails(df)
    assert(parsed.filter(col("text").contains("café")).count() == 1)
  }
}
