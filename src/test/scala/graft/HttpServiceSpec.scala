package graft

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets

import org.json4s._
import org.json4s.jackson.JsonMethods.parse

import graft.operators.TmpDirs
import graft.serve.{HttpService, QueryService}

/** Drives the HTTP front end-to-end over real sockets: two tenants
  * ingest and search with the reference's header contract
  * (`api/main.py:44-81`), cross-tenant access 404s, list / delete /
  * stats / health — the same behaviors QueryServiceSpec pins on the
  * op protocol, here reached through routes + headers + HTTP status
  * codes. */
class HttpServiceSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  implicit private val formats: Formats = DefaultFormats

  private lazy val http = {
    val h = new HttpService(new QueryService(spark, TmpDirs.create("graft_http")))
    h.start()
    h
  }

  private def call(method: String, path: String, org: Option[String],
                   body: Option[String] = None): (Int, JValue) = {
    val conn = new URL(s"http://127.0.0.1:${http.port}$path")
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    org.foreach(o => conn.setRequestProperty("X-Organization-ID", o))
    body.foreach { b =>
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/json")
      val os = conn.getOutputStream
      os.write(b.getBytes(StandardCharsets.UTF_8))
      os.close()
    }
    val status = conn.getResponseCode
    val is = if (status >= 400) conn.getErrorStream else conn.getInputStream
    val payload = new String(is.readAllBytes(), StandardCharsets.UTF_8)
    conn.disconnect()
    (status, parse(payload))
  }

  test("health is up before any ingest; search without the org header is 401") {
    val (hs, hb) = call("GET", "/health", None)
    assert(hs == 200 && (hb \ "status").extract[String] == "healthy")
    val (ss, _) = call("POST", "/search", None, Some("""{"query":"x"}"""))
    assert(ss == 401)
  }

  test("two tenants over HTTP: ingest, isolated search, cross-tenant 404, delete") {
    val (ia, ba) = call("POST", "/documents/ingest", Some("org_a"), Some(
      """{"docs":[{"filename":"lease.md","text":"# Lease Agreement\n\nThe tenant pays monthly rent of $2,000. The security deposit equals one month of rent."}]}"""))
    assert(ia == 200 && (ba \ "status").extract[String] == "completed")
    val leaseId = (ba \ "document_ids").extract[List[String]].head

    val (ib, _) = call("POST", "/documents/ingest", Some("org_b"), Some(
      """{"docs":[{"filename":"recipe.md","text":"# Bread Recipe\n\nMix flour, water, salt, and yeast. Bake the risen dough at high heat until golden."}]}"""))
    assert(ib == 200)

    // org_a finds its lease; org_b must not see it for the same query
    val (sa, ra) = call("POST", "/search", Some("org_a"),
      Some("""{"query":"monthly rent deposit","limit":5}"""))
    assert(sa == 200 && (ra \ "total_results").extract[Int] > 0)
    val (sb, rb) = call("POST", "/search", Some("org_b"),
      Some("""{"query":"monthly rent deposit","limit":5}"""))
    assert(sb == 200)
    assert((rb \ "results").extract[List[JValue]]
      .forall(r => !(r \ "text").extract[String].contains("rent")))

    // dense_mode flows through the HTTP body to the sidecar stores
    val (sq, rq) = call("POST", "/search", Some("org_b"),
      Some("""{"query":"flour dough bake","limit":3,"dense_mode":"quantized"}"""))
    assert(sq == 200 && (rq \ "total_results").extract[Int] > 0)

    // document routes: list is tenant-scoped; cross-tenant get/delete 404
    val (ls, lb) = call("GET", "/documents?limit=10", Some("org_a"))
    assert(ls == 200 && lb.extract[List[JValue]].size == 1)
    val (xg, _) = call("GET", s"/documents/$leaseId", Some("org_b"))
    assert(xg == 404)
    val (xd, _) = call("DELETE", s"/documents/$leaseId", Some("org_b"))
    assert(xd == 404)
    val (g, gb) = call("GET", s"/documents/$leaseId", Some("org_a"))
    assert(g == 200 && (gb \ "filename").extract[String] == "lease.md")
    val (d, _) = call("DELETE", s"/documents/$leaseId", Some("org_a"))
    assert(d == 200)
    val (_, after) = call("GET", "/documents", Some("org_a"))
    assert(after.extract[List[JValue]].isEmpty)

    // stats aggregates across tenants; unknown routes are 404
    val (st, sbdy) = call("GET", "/stats", Some("org_a"))
    assert(st == 200 && (sbdy \ "database" \ "documents").extract[Long] >= 1L)
    assert(call("GET", "/nope", Some("org_a"))._1 == 404)
  }

  test("keyset pagination: 5 docs page through by cursor, bounded collect") {
    val docs = (1 to 5).map(i =>
      s"""{"filename":"page_$i.md","text":"Cursor pagination fixture document number $i with distinct content."}""")
      .mkString("[", ",", "]")
    val (is, _) = call("POST", "/documents/ingest", Some("org_page"),
      Some(s"""{"docs":$docs}"""))
    assert(is == 200)

    def page(cursor: String): (List[JValue], Option[String]) = {
      val (s, b) = call("GET",
        s"/documents?limit=2&cursor=${java.net.URLEncoder.encode(cursor, "UTF-8")}",
        Some("org_page"))
      assert(s == 200)
      ((b \ "documents").extract[List[JValue]],
        (b \ "next_cursor").extractOpt[String])
    }
    // page 1: 2 docs + a cursor; page 2: 2 more; page 3: the last one,
    // cursor exhausted — ids strictly ascending with no overlap
    val (p1, c1) = page("")
    assert(p1.size == 2 && c1.isDefined)
    val (p2, c2) = page(c1.get)
    assert(p2.size == 2 && c2.isDefined)
    val (p3, c3) = page(c2.get)
    assert(p3.size == 1 && c3.isEmpty)
    val ids = (p1 ++ p2 ++ p3).map(d => (d \ "id").extract[String])
    assert(ids.distinct.size == 5)
    assert(ids == ids.sorted)

    // the legacy offset form walks the same order: offset pages match
    // the cursor walk exactly (same ids, same order)
    def offsetPage(off: Int): List[String] = {
      val (s, b) = call("GET", s"/documents?limit=2&offset=$off", Some("org_page"))
      assert(s == 200)
      b.extract[List[JValue]].map(d => (d \ "id").extract[String])
    }
    assert((offsetPage(0) ++ offsetPage(2) ++ offsetPage(4)) == ids)
    // past-the-end offset: empty page, not an error
    assert(offsetPage(40).isEmpty)
  }

  test("offset pagination keeps the skip inside the plan (bounded driver collect)") {
    // the pin behind the compat path: orderBy+offset+limit plans as a
    // TakeOrderedAndProject CARRYING the offset, so .collect() returns
    // `limit` rows at any depth — the driver never materializes
    // offset+limit rows (executors still pay the ordered scan, which
    // is SQL OFFSET's inherent cost; the cursor form avoids even that)
    import spark.implicits._
    val df = (1 to 1000).map(i => f"doc_$i%04d").toDF("document_id")
      .orderBy("document_id").offset(900).limit(5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("900"), plan)
    val rows = df.collect()
    assert(rows.length == 5)
    assert(rows.map(_.getString(0)).toSeq == (901 to 905).map(i => f"doc_$i%04d"))
  }

  override def afterAll(): Unit = {
    http.stop()
    super.afterAll()
  }
}
