package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.scalatest.funsuite.AnyFunSuite

import graft.api.{JdbcPublicationStore, RestApi}
import graft.model.TableRef

/** The control plane's serving surfaces: the REST layer (reference
  * api/tables.go, api/subscriptions.go, health) and the live
  * publication registry (reference publication.go ALTER PUBLICATION
  * under advisory lock), both against in-process infrastructure —
  * the JDK HttpServer and embedded Derby.
  */
class ApiServingSpec extends AnyFunSuite {

  private def get(port: Int, path: String): (Int, String) = {
    val client = HttpClient.newHttpClient()
    val res = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (res.statusCode(), res.body())
  }

  test("REST layer serves health, tables listing, and reconcile as JSON") {
    val api = new RestApi(
      tables = () => Seq(
        Map("schema" -> "public", "table_name" -> "example",
          "approximate_row_count" -> 3L, "publication_status" -> "active",
          "import_status" -> "complete", "import_rows_processed_total" -> None),
        Map("schema" -> "public", "table_name" -> "with\"quote",
          "approximate_row_count" -> 0L, "publication_status" -> "inactive",
          "import_status" -> "unknown", "import_rows_processed_total" -> Some(7L))),
      reconcile = () => (Seq(TableRef("public", "add_me")),
        Seq(TableRef("public", "drop_me"))))
    val port = api.start()
    try {
      assert(get(port, "/health") == ((200, """{"status":"healthy"}""")))
      val (code, body) = get(port, "/api/tables")
      assert(code == 200)
      assert(body.contains(""""table_name":"example"""") &&
        body.contains(""""approximate_row_count":3""") &&
        body.contains(""""import_rows_processed_total":null""") &&
        body.contains("""with\"quote""")) // escaped, parseable JSON
      // it IS json: parse with the same machinery Spark ships
      val parsed = org.json4s.jackson.JsonMethods.parse(body)
      assert(parsed.children.size == 2)
      val (rc, rb) = get(port, "/api/subscriptions/reconcile")
      assert(rc == 200)
      assert(rb ==
        """{"add":[{"schema":"public","name":"add_me"}],""" +
          """"remove":[{"schema":"public","name":"drop_me"}]}""")
    } finally api.stop()
  }

  test("REST layer turns supplier failures into 500 JSON errors") {
    val api = new RestApi(
      tables = () => throw new IllegalStateException("catalog down"),
      reconcile = () => (Nil, Nil))
    val port = api.start()
    try {
      val (code, body) = get(port, "/api/tables")
      assert(code == 500 && body.contains("catalog down"))
      // other routes unaffected
      assert(get(port, "/health")._1 == 200)
    } finally api.stop()
  }

  private val jdbcUrl = "jdbc:derby:memory:graftpub;create=true"

  test("publication registry reconciles membership transactionally") {
    val store = new JdbcPublicationStore(jdbcUrl)
    store.ensureSchema()
    store.ensureSchema() // idempotent
    val a = TableRef("public", "a"); val b = TableRef("public", "b")
    val c = TableRef("public", "c")
    // from empty: everything watched is added
    val (add1, rem1) = store.reconcile("pub1", Seq(a, b))
    assert(add1 == Seq(a, b) && rem1.isEmpty)
    assert(store.published("pub1") == Seq(a, b))
    // watch set moves: converge with one add and one remove
    val (add2, rem2) = store.reconcile("pub1", Seq(b, c))
    assert(add2 == Seq(c) && rem2 == Seq(a))
    assert(store.published("pub1") == Seq(b, c))
    // no-op reconcile: nothing to do
    assert(store.reconcile("pub1", Seq(b, c)) == ((Nil, Nil)))
    // publications are independent
    assert(store.published("pub-other").isEmpty)
  }

  private def post(port: Int, path: String, body: String): (Int, String) = {
    val client = HttpClient.newHttpClient()
    val res = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    (res.statusCode(), res.body())
  }

  test("subscription actions drive the registry and expire imports (reference add/stop-table)") {
    import java.sql.Timestamp
    import graft.api.SubscriptionManager
    import graft.jobs.ImportJobStore
    val store = new JdbcPublicationStore("jdbc:derby:memory:graftsub;create=true")
    store.ensureSchema()
    val jobs = new ImportJobStore
    val t0 = new Timestamp(1000000L)
    val mgr = new SubscriptionManager(store, "sub-1", jobs, now = () => t0)
    val api = new RestApi(
      tables = () => Nil,
      reconcile = () => (Nil, Nil),
      subscription = Some(mgr),
      imports = () => jobs.all)
    val port = api.start()
    try {
      // empty subscription document
      assert(get(port, "/api/subscriptions") ==
        ((200, """{"id":"sub-1","published_tables":[]}""")))
      // add two tables; idempotent re-add
      val (c1, b1) = post(port, "/api/subscriptions/actions/add-table",
        """{"schema":"public","name":"orders"}""")
      assert(c1 == 200 && b1.contains(""""name":"orders""""))
      post(port, "/api/subscriptions/actions/add-table",
        """{"schema":"public","name":"lineitem"}""")
      val (_, again) = post(port, "/api/subscriptions/actions/add-table",
        """{"schema":"public","name":"orders"}""")
      assert(org.json4s.jackson.JsonMethods.parse(again)
        .\("published_tables").children.size == 2)
      assert(store.published("sub-1") ==
        Seq(TableRef("public", "lineitem"), TableRef("public", "orders")))

      // an import job materializes for a published table
      jobs.reconcile("sub-1", store.published("sub-1"), t0)
      val (ic, ib) = get(port, "/api/imports")
      assert(ic == 200)
      val parsedJobs = org.json4s.jackson.JsonMethods.parse(ib).children
      assert(parsedJobs.size == 2 && ib.contains(""""expired_at":null"""))

      // stop-table: outstanding import expired FIRST, then membership
      // removed (the reference's crash-safe ordering)
      val (sc, sb) = post(port, "/api/subscriptions/actions/stop-table",
        """{"schema":"public","name":"orders"}""")
      assert(sc == 200 && !sb.contains(""""name":"orders""""))
      assert(store.published("sub-1") == Seq(TableRef("public", "lineitem")))
      val expired = jobs.all.filter(_.tableRef == TableRef("public", "orders"))
      assert(expired.nonEmpty && expired.forall(_.expiredAt.contains(t0)))
      // the listing reflects it over HTTP
      assert(get(port, "/api/imports")._2.contains(""""expired_at":"1970-01-01T00:16:40Z""""))

      // protocol edges: GET on an action is 405, bad JSON is 400
      assert(get(port, "/api/subscriptions/actions/add-table")._1 == 405)
      assert(post(port, "/api/subscriptions/actions/add-table", "{nope")._1 == 400)
      assert(post(port, "/api/subscriptions/actions/add-table",
        """{"schema":7}""")._1 == 400)
    } finally api.stop()
  }

  test("subscription routes 404 when no service is wired") {
    val api = new RestApi(tables = () => Nil, reconcile = () => (Nil, Nil))
    val port = api.start()
    try {
      assert(get(port, "/api/subscriptions")._1 == 404)
      assert(post(port, "/api/subscriptions/actions/add-table",
        """{"schema":"s","name":"t"}""")._1 == 404)
      // imports default supplier: empty array, not an error
      assert(get(port, "/api/imports") == ((200, "[]")))
    } finally api.stop()
  }

  test("concurrent reconciles serialize on the lock row (no interleaved state)") {
    val store = new JdbcPublicationStore(jdbcUrl)
    store.ensureSchema()
    val setA = (1 to 8).map(i => TableRef("s", s"a$i"))
    val setB = (1 to 8).map(i => TableRef("s", s"b$i"))
    val t1 = new Thread(() => store.reconcile("pub-race", setA))
    val t2 = new Thread(() => store.reconcile("pub-race", setB))
    t1.start(); t2.start(); t1.join(30000); t2.join(30000)
    val end = store.published("pub-race").toSet
    // last committer wins wholesale: the end state is exactly one of
    // the two target sets, never a mixture — the advisory-lock
    // guarantee the reference relies on
    assert(end == setA.toSet || end == setB.toSet, s"mixed state: $end")
  }
}
