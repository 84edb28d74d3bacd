package graft

import graft.operators.Poi

/** POI parsing parity.
  * References: tests/mock_gmap_response (expected parse: name=c,
  * categories=campground, major=lodging, tests/test_gps.py:261-268),
  * yelp dining_out dominance (gps.py:244-247), JSONDecodeError sentinel
  * (gps.py:228-236), hyperlink strip (gps.py:344).
  */
class PoiSpec extends SparkSpec {
  import spark.implicits._

  private val gmapMap = Map("campground" -> "lodging", "restaurant" -> "dining_out",
    "supermarket" -> "consumer_goods", "store" -> "consumer_goods", "food" -> "dining_out",
    "department_store" -> "consumer_goods", "gas_station" -> "transportation")
  private val yelpMap = Map("coffee" -> "dining_out", "banks" -> "finance",
    "gyms" -> "health", "bars" -> "dining_out")

  test("gmap mock response: name=c, categories=campground, major=lodging (test_gps.py:261-268)") {
    // same shape as tests/mock_gmap_response, with the embedded hyperlink
    val content =
      """{"html_attributions": [], "results": [{"name": "c",
        |"photos":[{"html_attributions": ["<a href=\"https://maps.example/contrib\">ll</a>"]}],
        |"types":["campground"], "vicinity": "c"}], "status": "OK"}""".stripMargin.replace("\n", " ")
    val r = Poi.parseGmap(Seq(Tuple1(content)).toDF("content"), gmapMap).head()
    assert(r.getAs[String]("name") === "c")
    assert(r.getAs[Int]("rank_order") === 0)
    assert(r.getAs[String]("categories") === "campground")
    assert(r.getAs[String]("major_categories") === "lodging")
  }

  test("gmap: ignored admin types are skipped, rank_order counts skipped results") {
    val content =
      """{"results": [{"name": "city", "types": ["locality", "political"]},
        |{"name": "shop", "types": ["store", "point_of_interest"]}]}""".stripMargin.replace("\n", " ")
    val r = Poi.parseGmap(Seq(Tuple1(content)).toDF("content"), gmapMap).head()
    assert(r.getAs[String]("name") === "shop")
    assert(r.getAs[Int]("rank_order") === 1)
    assert(r.getAs[String]("major_categories") === "consumer_goods") // store → gmapping(store)
  }

  test("gmap: named-store override (Sears → department_store)") {
    val content = """{"results": [{"name": "Sears", "types": ["store", "establishment"]}]}"""
    val r = Poi.parseGmap(Seq(Tuple1(content)).toDF("content"), gmapMap).head()
    assert(r.getAs[String]("categories") === "department_store")
  }

  test("gmap: malformed JSON → JSONDecodeError sentinel") {
    val r = Poi.parseGmap(Seq(Tuple1("{nope")).toDF("content"), gmapMap).head()
    assert(r.getAs[String]("major_categories") === "JSONDecodeError")
    assert(r.getAs[Int]("rank_order") === -1)
    assert(r.getAs[String]("categories") === "{nope")
  }

  test("gmap: all 14 driver payload variants match the hand-traced lattice outputs") {
    // the same fixtures the poi_gmap driver query + oracle use — pins the
    // hand-traced GmapExpected table against the actual parseGmap lattice
    val df = SparkEntry.GmapPayloads.zipWithIndex
      .map { case (c, i) => (i, c) }.toDF("i", "content")
    val out = Poi.parseGmap(df, SparkEntry.GmapMappings).orderBy("i").collect()
    out.zip(SparkEntry.GmapExpected).foreach { case (r, (name, rank, cat, maj)) =>
      assert(r.getAs[String]("name") === name, s"variant ${r.getAs[Int]("i")} name")
      assert(r.getAs[Int]("rank_order") === rank, s"variant ${r.getAs[Int]("i")} rank")
      assert(r.getAs[String]("categories") === cat, s"variant ${r.getAs[Int]("i")} categories")
      assert(r.getAs[String]("major_categories") === maj, s"variant ${r.getAs[Int]("i")} major")
    }
  }

  test("yelp: dining_out dominates mixed categories (gps.py:244-247)") {
    val content =
      """{"businesses": [{"name": "Cafe X", "categories":
        |[{"alias": "coffee"}, {"alias": "banks"}]}]}""".stripMargin.replace("\n", " ")
    val r = Poi.parseYelp(Seq(Tuple1(content)).toDF("content"), yelpMap).head()
    assert(r.getAs[String]("name") === "Cafe X")
    assert(r.getAs[String]("categories") === "coffee, banks")
    assert(r.getAs[String]("major_categories") === "dining_out")
  }

  test("yelp: empty businesses and nan content → sentinels (gps.py:219-226)") {
    val rows = Poi.parseYelp(Seq(Tuple1("""{"businesses": []}"""), Tuple1("nan")).toDF("content"),
      yelpMap).collect()
    rows.foreach { r =>
      assert(r.getAs[String]("name") === "not found")
      assert(r.getAs[Int]("rank_order") === -1)
      assert(r.getAs[String]("major_categories") === "none")
    }
  }
}
