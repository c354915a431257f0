package graft

import graft.ext.ByteBpe
import graft.functions.TextExprs
import graft.functions.TextExprs.ByteAlphabet
import org.apache.spark.sql.functions._

/** Byte-level BPE (GPT-2 family, r13): the byte↔char bijection, the
  * no-OOV round-trip law on arbitrary UTF-8 (emoji/CJK/control/
  * combining/supplementary), encode ≡ sequential reference, and
  * distributed train ≡ sequential reference. The DuckDB replay of the
  * fixed-merge encode is the `q_bpe_bytes` gate row.
  */
class ByteBpeSpec extends SparkSpec {
  import spark.implicits._

  // ── sequential reference (mirrors ExtSpec's word-BPE reference,
  //    over byte-mapped pretokens) ─────────────────────────────────
  private def refPretokens(text: String): Seq[String] = {
    val m = java.util.regex.Pattern.compile(ByteAlphabet.Pretokenizer)
      .matcher(text)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) out += ByteAlphabet.mapString(m.group())
    out.toSeq
  }

  private def refMergeList(s: List[String], a: String, b: String): List[String] = {
    val buf = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { buf += (a + b); i += 2 }
      else { buf += s(i); i += 1 }
    }
    buf.toList
  }

  private def refSegment(word: String, merges: Seq[(String, String)]): List[String] =
    merges.foldLeft(word.toList.map(_.toString)) { case (s, (a, b)) =>
      refMergeList(s, a, b)
    }

  private def refTrain(words: Map[String, Long], k: Int,
                       minCnt: Long): Seq[(String, String)] = {
    var syms: Seq[(List[String], Long)] =
      words.toSeq.map { case (w, c) => w.toList.map(_.toString) -> c }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var stop = false
    while (out.size < k && !stop) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((s, c) <- syms; Seq(a, b) <- s.sliding(2) if s.size >= 2)
        pc((a, b)) += c
      if (pc.isEmpty) stop = true
      else {
        val ((a, b), cnt) = pc.minBy { case ((x, y), c) => (-c, x, y) }
        if (cnt < minCnt) stop = true
        else {
          out += ((a, b))
          syms = syms.map { case (s, c) => refMergeList(s, a, b) -> c }
        }
      }
    }
    out.toSeq
  }

  private val gnarly = Seq(
    "Hello, wörld! 🎉🎉",          // emoji (surrogate pair)
    "日本語のテキストです。", // CJK
    "mixed 中文 and English 123",
    "tabs\tand\nnewlines \r\n  doubled  spaces",
    "",
    "   ",
    "'quoted' \"double\" & <tags>",
    "combining: éé",                        // e + combining acute
    "supplementary: 𝔘𝔫𝔦", // math fraktur
    "zero​width and nul-adjacent ")

  test("byte alphabet is a 256-char bijection; map/unmap round-trips bytes") {
    assert(ByteAlphabet.byteToChar.distinct.length == 256)
    // printable latin-1 maps to itself
    assert(ByteAlphabet.byteToChar('a'.toInt) == 'a')
    assert(ByteAlphabet.byteToChar('!'.toInt) == '!')
    // space is the classic U+0120 'Ġ'
    assert(ByteAlphabet.byteToChar(32) == 'Ġ')
    for (s <- gnarly)
      assert(ByteAlphabet.unmapString(ByteAlphabet.mapString(s)) == s)
  }

  test("round-trip law: decode(concat(encode(x))) == x for arbitrary UTF-8") {
    val df = gnarly.toDF("text")
    // under EMPTY merges, fixed merges, and merges trained on the
    // gnarly corpus itself — the law is structural, not lexical
    val trained = ByteBpe.train(df, "text", numMerges = 8, minPairCount = 1L)
    for (merges <- Seq(Nil, Seq("Ġ" -> "t", "l" -> "e"), trained)) {
      val bad = df.filter(!ByteBpe.roundTrips(col("text"), merges)).count()
      assert(bad == 0L, s"round-trip failed under merges $merges")
    }
  }

  test("pretokens keep the leading space; merges never cross pretokens") {
    val toks = Seq("the table slow").toDF("text")
      .select(TextExprs.byteBpePretokens(col("text")).as("p"))
      .as[Seq[String]].head()
    assert(toks == Seq("the", "Ġtable", "Ġslow"))
    // a merge of (e, Ġ) can never fire: the pair never shares a word
    val out = Seq("the table").toDF("text")
      .select(ByteBpe.encodeTokens(col("text"),
        Seq("e" -> "Ġ")).as("t")).as[Seq[String]].head()
    assert(out.forall(t => !t.contains("eĠ")))
  }

  test("encode matches the sequential reference on a mixed corpus") {
    val corpus = Seq(
      "the table is slow", "a slow key table", "key value table scan",
      "scan the slow part", "tabs\tare bytes too", "café latte 中文")
    val merges = Seq(
      "Ġ" -> "t", "Ġt" -> "a", "Ġta" -> "b", "l" -> "e",
      "Ġtab" -> "le", "Ġ" -> "s", "e" -> "y", "Ġs" -> "c")
    val got = ByteBpe.encode(corpus.toDF("text"), "text", merges)
      .as[(String, Long)].collect().toMap
    val want = corpus.flatMap(refPretokens)
      .flatMap(w => refSegment(w, merges))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == want)
  }

  test("train: distributed == sequential reference (byte-mapped types)") {
    val corpus = Seq(
      "the table the table slow", "slow slow key key key",
      "value value value table", "café café 中文 中文")
    val df = corpus.toDF("text")
    val wordCnt = corpus.flatMap(refPretokens)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (k <- Seq(0, 3, 12)) {
      val dist = ByteBpe.train(df, "text", numMerges = k, minPairCount = 2L)
      val ref = refTrain(wordCnt, k, 2L)
      assert(dist == ref, s"numMerges=$k")
    }
  }

  test("decode is loud on a char outside the alphabet") {
    intercept[Exception] {
      Seq("中").toDF("t").select(ByteBpe.decode(col("t"))).collect()
    }
  }
}
