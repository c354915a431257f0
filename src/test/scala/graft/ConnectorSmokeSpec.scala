package graft

import graft.dsl.QueryCompiler
import graft.sources.Resolver
import org.apache.spark.sql.DataFrame
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Connector pushdown SMOKE: the compiled `$match` pipeline and es
  * bool-filter documents are EXECUTED, not just string-compared.
  *
  * The sandbox has no mongod/elasticsearch binary, no connector jars
  * and zero egress, so "a real server" is impossible here; the next
  * best evidence, and what this suite provides:
  *
  *   1. every compiled document round-trips a REAL JSON parser
  *      (jackson-databind, the same parser family both servers use on
  *      the wire) — malformed quoting/nesting fails loudly;
  *   2. a STRICT independent interpreter of the documented server
  *      semantics (mongo `$match` operators, es bool filter/must_not)
  *      executes each document against a fixture collection — any
  *      misspelled operator (`$ge`), wrong nesting, or wrong list
  *      encoding throws instead of silently matching nothing;
  *   3. the es path additionally runs over REAL HTTP: the exact
  *      `es.query` bytes are POSTed to an embedded `_search` endpoint
  *      (JDK HttpServer) and results come back through the wire;
  *   4. the engine contract is asserted per query: pushdown may OVER-
  *      include but never under-include (engine rows ⊆ server rows),
  *      and fully-pushable queries match exactly.
  *
  * When `GRAFT_SMOKE_ES_URL` points at a live elasticsearch (e.g. a
  * dev cluster outside this sandbox), an additional env-gated test
  * seeds an index over HTTP and executes the same queries against the
  * real server's parser. Reference behavior anchor: etl_cli/etl.py:252-257
  * (backend dispatch), base.py:556-557 (server-side filter).
  */
class ConnectorSmokeSpec extends SparkSpec {

  // fixture rows: (id, name, age, score, tag) with nulls in play
  private val fixture: Seq[(Long, String, Long, Option[Double], Option[String])] = Seq(
    (1L, "alice", 30L, Some(1.5), Some("x")),
    (2L, "bob", 41L, Some(2.5), None),
    (3L, "carol", 25L, None, Some("y")),
    (4L, "dave", 26L, Some(0.5), Some("x")),
    (5L, "erin", 41L, Some(3.5), None))

  private lazy val df: DataFrame = {
    import spark.implicits._
    fixture.toDF("id", "name", "age", "score", "tag")
  }

  /** The same rows as loose maps (absent = the doc never had the
    * field) — the shape a document store holds.
    */
  private val docs: Seq[Map[String, Any]] = fixture.map { case (i, n, a, s, t) =>
    Map[String, Any]("id" -> i, "name" -> n, "age" -> a) ++
      s.map("score" -> _).toMap ++ t.map("tag" -> _).toMap
  }

  private def engineIds(query: Seq[(String, String)]): Set[Long] = {
    val preds = QueryCompiler.compile(df, query).predicates
    preds.foldLeft(df)(_ filter _).select("id").collect().map(_.getLong(0)).toSet
  }

  private val cases: Seq[(String, Seq[(String, String)], Boolean)] = Seq(
    // (label, DSL query, fullyPushed? → exact match expected)
    ("eq_string", Seq("name" -> "alice"), true),
    ("gte_number", Seq("age__gte" -> "30"), true),
    ("in_list", Seq("age__in" -> "25,41"), true),
    ("gt_double", Seq("score__gt" -> "1.0"), true),
    ("exists_pos", Seq("tag__exists" -> "1"), true),
    ("ne_string", Seq("name__ne" -> "bob"), true),
    ("between", Seq("age__between" -> "26,42"), true),
    ("nin_list", Seq("age__nin" -> "30,41"), true),
    ("combo_and", Seq("age__gte" -> "26", "name__ne" -> "bob"), true),
    // contains is NOT pushed → server over-includes, engine narrows
    ("unpushed_contains", Seq("name__contains" -> "li"), false),
    ("mixed_pushed_unpushed", Seq("age__gte" -> "26", "name__contains" -> "a"), false))

  test("mongo $match pipeline executes under a strict interpreter; no under-inclusion") {
    for ((label, q, fully) <- cases) {
      val pipeline = Resolver.mongoPipeline(q)
      val serverIds = MongoMatchInterpreter.run(pipeline, docs)
        .map(_("id").asInstanceOf[Long]).toSet
      val engine = engineIds(q)
      assert(engine.subsetOf(serverIds),
        s"$label: pushdown under-included — engine $engine vs server $serverIds\n$pipeline")
      if (fully) assert(engine == serverIds,
        s"$label: fully-pushable query should match exactly\n$pipeline")
    }
  }

  test("mongo regex pushes unanchored-find semantics matching the engine's rlike") {
    val q = Seq("name__regex" -> "^a")
    val serverIds = MongoMatchInterpreter.run(Resolver.mongoPipeline(q), docs)
      .map(_("id").asInstanceOf[Long]).toSet
    assert(serverIds == engineIds(q) && serverIds == Set(1L))
  }

  test("strict interpreter rejects unknown operators (typo guard)") {
    intercept[IllegalArgumentException] {
      MongoMatchInterpreter.run("""[{"$match": {"age": {"$ge": 30}}}]""", docs)
    }
    intercept[IllegalArgumentException] {
      EsQueryInterpreter.run("""{"query": {"bool": {"filtr": []}}}""", docs)
    }
  }

  test("es bool-filter query executes over real HTTP against the embedded _search endpoint") {
    val server = EsStandInServer.start(docs)
    try {
      for ((label, q, fully) <- cases) {
        val body = Resolver.esQuery(q)
        val serverIds = EsStandInServer.search(server, body)
        val engine = engineIds(q)
        assert(engine.subsetOf(serverIds),
          s"$label: es pushdown under-included — engine $engine vs server $serverIds\n$body")
        if (fully) assert(engine == serverIds,
          s"$label: fully-pushable es query should match exactly\n$body")
      }
    } finally server.stop(0)
  }

  test("live elasticsearch smoke (env-gated: GRAFT_SMOKE_ES_URL)") {
    sys.env.get("GRAFT_SMOKE_ES_URL") match {
      case None => cancel("set GRAFT_SMOKE_ES_URL=http://host:9200 to run against a live cluster")
      case Some(url) =>
        // seed a throwaway index over the bulk API, then execute the
        // exact compiled es.query bytes through the server's own parser
        val http = java.net.http.HttpClient.newHttpClient()
        def req(method: String, path: String, body: String) = {
          val r = java.net.http.HttpRequest.newBuilder()
            .uri(java.net.URI.create(s"$url$path"))
            .header("Content-Type", "application/json")
            .method(method, java.net.http.HttpRequest.BodyPublishers.ofString(body))
            .build()
          http.send(r, java.net.http.HttpResponse.BodyHandlers.ofString())
        }
        val idx = s"graft_smoke_${System.currentTimeMillis()}"
        val om = new ObjectMapper()
        val bulk = docs.map { d =>
          s"""{"index":{"_index":"$idx","_id":"${d("id")}"}}\n""" +
            om.writeValueAsString(d.asJava)
        }.mkString("", "\n", "\n")
        assert(req("POST", "/_bulk?refresh=true", bulk).statusCode() < 300)
        try {
          for ((label, q, fully) <- cases) {
            val body = Resolver.esQuery(q)
            val resp = req("POST", s"/$idx/_search?size=100", body)
            assert(resp.statusCode() < 300, s"$label: live es rejected the query: ${resp.body()}")
            val hits = om.readTree(resp.body()).path("hits").path("hits")
            val serverIds = hits.asScala.map(_.path("_id").asText().toLong).toSet
            val engine = engineIds(q)
            assert(engine.subsetOf(serverIds), s"$label: live es under-included")
            if (fully) assert(engine == serverIds, s"$label: live es mismatch")
          }
        } finally req("DELETE", s"/$idx", "")
    }
  }
}

/** Strict executor of a mongo aggregation pipeline's `$match` stage
  * over in-memory documents, implementing the DOCUMENTED server
  * semantics (implicit AND; `$exists: true` matches explicit null,
  * `$regex` is unanchored find; comparisons are typed). Unknown
  * stages/operators throw — the typo guard that makes the smoke test
  * meaningful.
  */
object MongoMatchInterpreter {
  private val om = new ObjectMapper()

  def run(pipeline: String, docs: Seq[Map[String, Any]]): Seq[Map[String, Any]] = {
    val root = om.readTree(pipeline)
    require(root.isArray, s"pipeline must be a JSON array: $pipeline")
    var cur = docs
    root.asScala.foreach { stage =>
      require(stage.isObject && stage.size == 1, s"malformed stage: $stage")
      val name = stage.fieldNames().next()
      if (name != "$match")
        throw new IllegalArgumentException(s"unsupported stage: $name")
      val m = stage.get("$match")
      cur = cur.filter(d => matches(m, d))
    }
    cur
  }

  private def matches(m: JsonNode, doc: Map[String, Any]): Boolean =
    m.fields().asScala.forall { e =>
      val (field, spec) = (e.getKey, e.getValue)
      if (spec.isObject) {
        require(spec.fieldNames().asScala.forall(_.startsWith("$")),
          s"operator object with non-operator key: $spec")
        spec.fields().asScala.forall(op => applyOp(op.getKey, op.getValue, field, doc))
      } else cmpEq(doc.get(field), spec)
    }

  private def applyOp(op: String, v: JsonNode, field: String,
                      doc: Map[String, Any]): Boolean = {
    def value = doc.get(field)
    op match {
      case "$eq" => cmpEq(value, v)
      case "$ne" => !cmpEq(value, v)
      case "$gt" => cmpNum(value, v).exists(_ > 0)
      case "$gte" => cmpNum(value, v).exists(_ >= 0)
      case "$lt" => cmpNum(value, v).exists(_ < 0)
      case "$lte" => cmpNum(value, v).exists(_ <= 0)
      case "$in" => v.asScala.exists(x => cmpEq(value, x))
      case "$nin" => !v.asScala.exists(x => cmpEq(value, x))
      case "$exists" =>
        if (v.asBoolean()) doc.contains(field) else !doc.contains(field)
      case "$regex" =>
        value.exists(x => x != null &&
          java.util.regex.Pattern.compile(v.asText()).matcher(x.toString).find())
      case other => throw new IllegalArgumentException(s"unknown \\$$-operator: $other")
    }
  }

  private[graft] def cmpEq(value: Option[Any], lit: JsonNode): Boolean = value match {
    case None | Some(null) => lit.isNull
    case Some(x) =>
      if (lit.isNumber) cmpNum(Some(x), lit).contains(0)
      else if (lit.isTextual) x.toString == lit.asText()
      else if (lit.isBoolean) x == lit.asBoolean()
      else throw new IllegalArgumentException(s"unsupported literal: $lit")
  }

  /** Typed numeric compare; None when the doc value is absent/null or
    * not numeric (comparisons with missing are no-match, per mongo).
    */
  private[graft] def cmpNum(value: Option[Any], lit: JsonNode): Option[Int] = value match {
    case Some(n: Number) if lit.isNumber =>
      Some(BigDecimal(n.toString).compare(BigDecimal(lit.asText())))
    case Some(s: String) if lit.isTextual => Some(s.compareTo(lit.asText()))
    case _ => None
  }
}

/** Strict executor of an elasticsearch bool-filter query document
  * (`filter` = AND, `must_not` = NOR; `term`/`terms`/`range`/`exists`;
  * `exists` matches present-and-non-null, per the es docs). Unknown
  * keys throw.
  */
object EsQueryInterpreter {
  private val om = new ObjectMapper()

  def run(queryDoc: String, docs: Seq[Map[String, Any]]): Seq[Map[String, Any]] = {
    val root = om.readTree(queryDoc)
    val q = root.path("query")
    require(!q.isMissingNode, s"es document must have a query: $queryDoc")
    docs.filter(d => evalQuery(q, d))
  }

  private def evalQuery(q: JsonNode, doc: Map[String, Any]): Boolean = {
    require(q.isObject && q.size == 1, s"query must hold one clause: $q")
    val name = q.fieldNames().next()
    val body = q.get(name)
    name match {
      case "match_all" => true
      case "bool" =>
        body.fields().asScala.forall { e =>
          e.getKey match {
            case "filter" => e.getValue.asScala.forall(c => evalQuery(c, doc))
            case "must_not" => !e.getValue.asScala.exists(c => evalQuery(c, doc))
            case other => throw new IllegalArgumentException(s"unknown bool key: $other")
          }
        }
      case "term" =>
        val f = body.fieldNames().next()
        MongoMatchInterpreter.cmpEq(doc.get(f).filter(_ != null), body.get(f)) &&
          doc.get(f).exists(_ != null)
      case "terms" =>
        val f = body.fieldNames().next()
        body.get(f).asScala.exists(x =>
          doc.get(f).exists(_ != null) && MongoMatchInterpreter.cmpEq(doc.get(f), x))
      case "range" =>
        val f = body.fieldNames().next()
        body.get(f).fields().asScala.forall { b =>
          val c = MongoMatchInterpreter.cmpNum(doc.get(f).filter(_ != null), b.getValue)
          b.getKey match {
            case "gt" => c.exists(_ > 0)
            case "gte" => c.exists(_ >= 0)
            case "lt" => c.exists(_ < 0)
            case "lte" => c.exists(_ <= 0)
            case other => throw new IllegalArgumentException(s"unknown range op: $other")
          }
        }
      case "exists" => doc.get(body.get("field").asText()).exists(_ != null)
      case other => throw new IllegalArgumentException(s"unknown query clause: $other")
    }
  }
}

/** Embedded `_search` endpoint: the exact `es.query` bytes go over
  * HTTP and come back as hit ids — the transport leg of the smoke.
  */
object EsStandInServer {
  def start(docs: Seq[Map[String, Any]]): com.sun.net.httpserver.HttpServer = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/fixture/_search", exchange => {
      val body = new String(exchange.getRequestBody.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      val (code, resp) =
        try {
          val hits = EsQueryInterpreter.run(body, docs)
          (200, hits.map(d => s"""{"_id": "${d("id")}"}""")
            .mkString("""{"hits": {"hits": [""", ", ", "]}}"))
        } catch {
          case e: Exception => (400, s"""{"error": "${e.getMessage}"}""")
        }
      val bytes = resp.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      exchange.getResponseHeaders.set("Content-Type", "application/json")
      exchange.sendResponseHeaders(code, bytes.length)
      exchange.getResponseBody.write(bytes)
      exchange.close()
    })
    server.start()
    server
  }

  def search(server: com.sun.net.httpserver.HttpServer, queryDoc: String): Set[Long] = {
    val port = server.getAddress.getPort
    val http = java.net.http.HttpClient.newHttpClient()
    val req = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(s"http://127.0.0.1:$port/fixture/_search"))
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(queryDoc))
      .build()
    val resp = http.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200, s"_search failed: ${resp.body()}")
    val om = new ObjectMapper()
    om.readTree(resp.body()).path("hits").path("hits").asScala
      .map(_.path("_id").asText().toLong).toSet
  }
}
