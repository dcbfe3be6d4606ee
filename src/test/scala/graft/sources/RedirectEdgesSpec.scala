package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RedirectEdgesSpec extends SparkSpec {
  import spark.implicits._

  private def recs(rows: (String, Int, String)*) =
    rows.toDF("target_uri", "http_status", "http_location")

  test("edges: Location resolved against the record URI, self-redirects dropped") {
    val e = RedirectEdges.edges(recs(
      ("http://a.com/x/1", 301, "/y"),              // relative → resolved
      ("http://a.com/x/2", 302, "http://b.com/z"),  // absolute → verbatim
      ("http://a.com/x/3", 307, "next"),            // path-relative
      ("http://a.com/self", 301, "http://a.com/self"), // self-loop → dropped
      ("http://a.com/ok", 200, "http://a.com/ignored") // non-3xx → dropped
    )).orderBy("src").as[(String, String, Int)].collect().toSeq
    assert(e == Seq(
      ("http://a.com/x/1", "http://a.com/y", 301),
      ("http://a.com/x/2", "http://b.com/z", 302),
      ("http://a.com/x/3", "http://a.com/x/next", 307)), s"edges: $e")
  }

  test("edges: null location / null uri rows contribute nothing") {
    val df = Seq(
      ("http://a.com/1", Some(301), None: Option[String]),
      (null: String, Some(301), Some("/x")),
      ("http://a.com/2", None: Option[Int], Some("/y")))
      .toDF("target_uri", "http_status", "http_location")
    assert(RedirectEdges.edges(df).isEmpty)
  }

  test("resolveChains: multi-hop chains resolve; cycles and over-long chains drop") {
    val e = Seq(
      ("a", "b"), ("b", "c"), ("c", "d"),   // 3-hop chain → d
      ("p", "q"),                           // 1-hop
      ("x", "y"), ("y", "x"),               // 2-cycle → dropped
      ("l1", "l2"), ("l2", "l3"), ("l3", "l4"), ("l4", "l5"),
      ("l5", "l6"), ("l6", "l7")            // 6 hops > maxHops=5 head drops
    ).toDF("src", "dst")
    val got = RedirectEdges.resolveChains(e, maxHops = 5)
      .orderBy("src").as[(String, String, Int)].collect().toSeq
    assert(got.contains(("a", "d", 3)) && got.contains(("b", "d", 2)) &&
      got.contains(("c", "d", 1)) && got.contains(("p", "q", 1)),
      s"chains: $got")
    assert(!got.exists(r => r._1 == "x" || r._1 == "y"), s"cycle survived: $got")
    // l1 needs 6 hops — dropped; l2 resolves in exactly 5
    assert(!got.exists(_._1 == "l1"), s"over-long chain survived: $got")
    assert(got.contains(("l2", "l7", 5)), s"5-hop chain lost: $got")
  }
}
