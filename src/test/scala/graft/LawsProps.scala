package graft

import graft.operators.{MergePlanner, WriteOps}
import graft.spec.{DatasetRef, MergerSpec}
import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-based laws (SURVEY §5.3): upsert idempotence, insert
  * uniqueness, match/no-match partition, count-cap min rule — checked
  * over randomly generated small frames.
  */
object LawsProps extends Properties("graft.laws") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8) // each case spins Spark jobs; keep tight

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val rowsGen: Gen[List[(Long, String, Double)]] =
    Gen.listOfN(12, for {
      k <- Gen.chooseNum(0L, 7L)
      s <- Gen.oneOf("a", "b", "c", null)
      v <- Gen.chooseNum(-5.0, 5.0)
    } yield (k, s, v))

  private def df(rows: List[(Long, String, Double)]): DataFrame =
    rows.toDF("id", "tag", "amt")

  private def canon(d: DataFrame): Set[Seq[Any]] =
    d.collect().toSet.map((r: org.apache.spark.sql.Row) => r.toSeq)

  property("upsert idempotence: upsert∘upsert = upsert") =
    forAll(rowsGen, rowsGen) { (t, b) =>
      val target = df(t); val batch = df(b)
      val once = WriteOps.upsert(target, batch, Seq("id"))
      val twice = WriteOps.upsert(once, batch, Seq("id"))
      canon(once) == canon(twice)
    }

  property("insert never duplicates a pk") =
    forAll(rowsGen, rowsGen) { (t, b) =>
      val target = df(t).dropDuplicates("id")
      val out = WriteOps.insert(target, df(b), Seq("id"))
      out.groupBy("id").count().filter($"count" > 1).count() == 0
    }

  property("delete ∘ insert of same keys = original target") =
    forAll(rowsGen, rowsGen) { (t, b) =>
      val target = df(t).dropDuplicates("id")
      // keys disjoint from target so insert adds them all
      val batch = df(b).withColumn("id", $"id" + 100L).dropDuplicates("id")
      val inserted = WriteOps.insert(target, batch, Seq("id"))
      val deleted = WriteOps.delete(inserted, batch, Seq("id"))
      canon(deleted) == canon(target)
    }

  property("require_match ∪ require_no_match partitions the source") =
    forAll(rowsGen, rowsGen) { (s, m) =>
      val src = df(s)
      val mrg = df(m).toDF("id", "mtag", "mamt")
      val ref = DatasetRef("parquet", "", "x")
      val spec = MergerSpec(ref, query = Seq("id" -> "#id#"))
      val matched = MergePlanner.merge(src, mrg, spec.copy(requireMatch = true))
      val unmatched = MergePlanner.merge(src, mrg, spec.copy(requireNoMatch = true))
      matched.count() + unmatched.count() == src.count()
    }

  property("exact dedup is idempotent and key-unique") =
    forAll(rowsGen) { rows =>
      val d = df(rows).withColumn("text",
        org.apache.spark.sql.functions.concat_ws(" ", $"tag", $"tag"))
      val once = graft.ext.TextDedup.exact(d, "text", "id")
      val twice = graft.ext.TextDedup.exact(once, "text", "id")
      canon(once) == canon(twice) &&
        once.groupBy(org.apache.spark.sql.functions.lower(
          org.apache.spark.sql.functions.trim($"text"))).count()
          .filter($"count" > 1).count() == 0
    }

  property("merge rule sum: unmatched rows keep source values") =
    forAll(rowsGen) { s =>
      val src = df(s)
      // merger with keys guaranteed disjoint → nothing matches
      val mrg = df(s).toDF("id", "tag", "amt")
        .withColumn("id", $"id" + 1000L)
      val spec = MergerSpec(DatasetRef("parquet", "", "x"),
        query = Seq("id" -> "#id#"),
        mergeRule = Some(graft.spec.TransformStage("sum", Seq("amt"))))
      val out = MergePlanner.merge(src, mrg, spec)
      canon(out.select("id", "amt")) == canon(src.select("id", "amt"))
    }

  property("components: every label is ≤ its id and present in the pair set") =
    forAll(Gen.listOfN(8, Gen.zip(Gen.chooseNum(0L, 5L), Gen.chooseNum(0L, 5L)))) { ps =>
      val pairs = ps.filter(p => p._1 != p._2)
      pairs.isEmpty || {
        val comps = graft.ext.TextDedup.components(
          pairs.toDF("id_a", "id_b"))
        val ok = comps.filter($"label" > $"id").count() == 0
        val ids = pairs.flatMap(p => Seq(p._1, p._2)).toSet
        ok && canon(comps.select("id")).map(_.head) == ids.map(_.asInstanceOf[Any])
      }
    }

  property("components: star contraction equals driver union-find") =
    forAll(Gen.listOfN(20, Gen.zip(Gen.chooseNum(0L, 30L), Gen.chooseNum(0L, 30L)))) { ps =>
      val pairs = ps.filter(p => p._1 != p._2)
      pairs.isEmpty || {
        val df = pairs.toDF("id_a", "id_b")
        val uf = canon(graft.ext.TextDedup.components(df))
        val star = canon(graft.ext.TextDedup.components(df, driverMaxPairs = 0L))
        uf == star
      }
    }

  property("range join ≡ cross-filter for any bucket width") =
    forAll(
      Gen.listOfN(10, Gen.chooseNum(-20.0, 20.0)),
      Gen.listOfN(6, Gen.zip(Gen.chooseNum(-20.0, 20.0), Gen.chooseNum(0.0, 15.0))),
      Gen.oneOf(0.7, 3.0, 11.0)
    ) { (xs, ivs, w) =>
      val pts = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }
        .toDF("pid", "x")
      val intervals = ivs.zipWithIndex
        .map { case ((lo, len), i) => (i.toLong + 100L, lo, lo + len) }
        .toDF("iid", "lo", "hi")
      val got = canon(graft.ext.RangeJoin
        .rangeJoin(pts, intervals, "x", "lo", "hi", w).select("pid", "iid"))
      val naive = canon(pts.crossJoin(intervals)
        .filter($"x" >= $"lo" && $"x" < $"hi").select("pid", "iid"))
      got == naive
    }

  property("dsir: scoreWithin ≡ score on the filtered slice") =
    forAll(Gen.listOfN(6, Gen.listOfN(5, Gen.oneOf("a", "b", "c", "d", "e")))) { docs =>
      val d = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val cond = $"doc_id" % 2 === 0
      val a = graft.ext.Dsir.score(d, d.filter(cond), "doc_id", "text", 2)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      val b = graft.ext.Dsir.scoreWithin(d, cond, "doc_id", "text", 2)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      a.keySet == b.keySet && a.forall { case (k, v) => math.abs(v - b(k)) < 1e-9 }
    }

  property("encode: ids are a bijection on the kept vocab; stream length preserved") =
    forAll(Gen.listOfN(6, Gen.listOfN(4, Gen.oneOf("a", "b", "c", "d", "e", "f")))) { docs =>
      val d = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val enc = graft.ext.TextAnalysis.encodeTokens(d, "doc_id", "text", 4)
      val total = docs.map(_.length).sum
      val idsPerTok = enc.count() == total.toLong && {
        // joining tokens back: each nonzero id maps to exactly one token
        val tk = d.select($"doc_id", org.apache.spark.sql.functions.posexplode(
          graft.ext.TextDedup.tokens($"text")))
          .toDF("doc_id", "pos", "token")
        val joined = enc.join(tk, Seq("doc_id", "pos"))
        joined.filter($"token_id" =!= 0L)
          .groupBy("token_id")
          .agg(org.apache.spark.sql.functions.countDistinct($"token").as("nt"))
          .filter($"nt" > 1).count() == 0
      }
      idsPerTok
    }

  property("int8 quantization: codes in ±127, dequant error ≤ scale/2 per component") =
    forAll(Gen.listOfN(5, Gen.listOfN(8,
      Gen.chooseNum(-10.0, 10.0).map(_.toFloat)))) { vecs =>
      val d = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
        .toDF("vec_id", "embedding")
      val q = graft.ext.Similarity.quantizeEmbeddings(d, "vec_id", "embedding")
      val rows = q.join(d, "vec_id")
        .select($"scale", $"codes", $"embedding")
        .as[(Double, Seq[Int], Seq[Float])].collect()
      rows.forall { case (s, codes, orig) =>
        codes.forall(c => c >= -127 && c <= 127) &&
          codes.zip(orig).forall { case (c, x) =>
            math.abs(c * s - x) <= s / 2 + 1e-9 }
      }
    }

  property("temperature: alpha=1 is the identity; expected size preserved") =
    forAll(Gen.listOfN(30, Gen.oneOf("x", "y", "z"))) { srcs =>
      val d = srcs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("doc_id", "source")
      val id = graft.ext.CorpusOps.temperatureSample(d, "doc_id", "source", 1.0)
      // every multiplier is exactly 1 → one copy per row
      id.count() == srcs.length.toLong &&
        id.select(org.apache.spark.sql.functions.max($"copy")).as[Long].head() == 1L
    }

  property("containment pairs ⊇ jaccard pairs at the same threshold") =
    forAll(Gen.listOfN(6, Gen.listOfN(6,
      Gen.oneOf("a", "b", "c", "d", "e")))) { docs =>
      val d = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val c = graft.ext.TextDedup.containmentPairs(d, "doc_id", "text", 2, 0.8)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val j = graft.ext.TextDedup.jaccardPairs(d, "doc_id", "text", 2, 0.8)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      j.subsetOf(c)
    }

  property("bpe: double-replace segmentation == sequential greedy merge") =
    forAll(
      Gen.listOfN(6, Gen.listOfN(8, Gen.oneOf("a", "b", "c")).map(_.mkString)),
      Gen.listOfN(3, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.oneOf("a", "b", "c")))
    ) { (words, m1) =>
      // merge list grows like real BPE: later merges may reference the
      // token minted by an earlier one
      val merges = m1 match {
        case (a, b) :: rest => (a, b) :: rest.zipWithIndex.map {
          case ((x, _), 0) => (a + b, x)
          case (p, _) => p
        }
        case Nil => Nil
      }
      def seqSegment(w: String): List[String] =
        merges.foldLeft(w.toList.map(_.toString)) { case (s, (a, b)) =>
          val buf = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
              buf += (a + b); i += 2
            } else { buf += s(i); i += 1 }
          }
          buf.toList
        }
      val got = words.toDF("w")
        .select(graft.ext.Bpe.segmentWord($"w", merges).as("t"))
        .as[Seq[String]].collect().toSeq
      got == words.map(w => seqSegment(w).toSeq)
    }

  property("count cap: min(limit, total)") =
    forAll(rowsGen, Gen.chooseNum(0, 20)) { (t, lim) =>
      val d = df(t)
      val total = d.count()
      val capped = math.min(lim.toLong, total)
      // mirror Runner.count's min rule on an in-memory frame
      val q = graft.dsl.QueryCompiler.compile(d, Seq("_limit" -> lim.toString))
      q.limit.map(l => math.min(l.toLong, total)).getOrElse(total) == capped
    }

  // messy-URL generator: mixed-case scheme/host, optional port,
  // path with optional trailing slashes, tracking + real params in
  // random order, optional fragment — the forms canonicalize exists
  // to collapse
  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "HTTP", "https", "HTTPS")
    hostCase <- Gen.oneOf("Example.COM", "example.com", "News.Site.ORG")
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    path <- Gen.oneOf("", "/A/b", "/x", "/x/", "/x///")
    params <- Gen.someOf("utm_source=t", "a=1", "b=2", "gclid=9", "z=Q")
    frag <- Gen.oneOf("", "#top")
  } yield s"$scheme://www.$hostCase$port$path" +
    (if (params.isEmpty) "" else params.mkString("?", "&", "")) + frag

  property("url canonicalize is idempotent: canon∘canon = canon") =
    forAll(Gen.listOfN(6, urlGen)) { urls =>
      val once = urls.toDF("url")
        .select(graft.ext.UrlOps.canonicalize($"url").as("c"))
      val twice = once
        .select(graft.ext.UrlOps.canonicalize($"c").as("c"))
      once.as[String].collect().toSeq == twice.as[String].collect().toSeq
    }

  property("pii redact is idempotent: redact∘redact = redact") =
    forAll(Gen.listOfN(4, Gen.oneOf(
      "mail a.b@x.io now", "see https://h.io/p?x=1", "host 10.0.0.1",
      "call +1 415 555 0100", "clean text", ""))) { texts =>
      val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val once = graft.ext.CorpusOps.piiRedact(d)
      val twice = graft.ext.CorpusOps.piiRedact(once)
      once.select("text").as[String].collect().toSeq ==
        twice.select("text").as[String].collect().toSeq
    }
}
