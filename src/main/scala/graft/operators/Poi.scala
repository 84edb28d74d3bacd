package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** POI response parsing + category normalization (H6/H7/H8):
  * parse_yelp_response (gscap/gps.py:215-257) and parse_gmap_response
  * (gscap/gps.py:338-448) as deterministic expression pipelines over
  * `from_json`, with the category dimension supplied as a (cat → mapping)
  * table (the reference ships yelp_mappings.txt / gmap_mappings.txt;
  * callers pass their own copy — broadcast-sized).
  *
  * Determinism note: the reference picks "the first" element of Python SETS
  * (gps.py:247 `major[0]`, gps.py:423 `list(types)[0]`), whose order is
  * hash-seed dependent — i.e. the reference itself is nondeterministic
  * across processes. This engine canonicalizes every set to a SORTED array
  * before "first", making results stable; fixtures pin the sorted choice.
  */
object Poi {

  val YelpSchema: DataType = StructType(Seq(
    StructField("businesses", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("categories", ArrayType(StructType(Seq(
        StructField("alias", StringType))))))))),
    StructField("_corrupt_record", StringType)))

  val GmapSchema: DataType = StructType(Seq(
    StructField("error", StringType),
    StructField("results", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("types", ArrayType(StringType)))))),
    StructField("_corrupt_record", StringType)))

  private val JsonOpts = Map("columnNameOfCorruptRecord" -> "_corrupt_record")

  val IgnoredPlaceTypes: Seq[String] = Seq(
    "administrative_area_level", "administrative_area_level_1", "administrative_area_level_2",
    "administrative_area_level_3", "administrative_area_level_4", "administrative_area_level_5",
    "country", "route", "street_address", "street_number",
    "sublocality", "sublocality_level_5", "sublocality_level_4", "sublocality_level_3",
    "sublocality_level_2", "sublocality_level_1", "subpremise", "locality", "political")

  /** Major-category lattice heads (gps.py:372-377). */
  val MajorTypes: Seq[String] = Seq(
    "food", "store", "repair", "finance", "restaurant", "park", "health",
    "transit_station", "lodging", "place_of_worship", "doctor")

  private def lookup(m: Map[String, String], key: Column): Column =
    coalesce(try_element_at(typedlit(m), key), lit("undefined category"))

  /** parse_yelp_response: first business → aliases → mapped majors;
    * dining_out dominates; ties → first of the sorted set. Input column
    * `content` (JSON string); malformed → JSONDecodeError sentinel
    * (gps.py:228-236); no businesses → not-found sentinel.
    */
  def parseYelp(df: DataFrame, yelpMappings: Map[String, String]): DataFrame = {
    val parsed = from_json(col("content"), YelpSchema, JsonOpts)
    val b      = try_element_at(parsed.getField("businesses"), lit(1))
    val minor  = transform(b.getField("categories"), c => c.getField("alias"))
    val major0 = array_sort(array_distinct(transform(minor, a => lookup(yelpMappings, a))))
    val major  = when(array_contains(major0, "dining_out"), array(lit("dining_out")))
      .when(size(major0) > 1, slice(major0, 1, 1))
      .otherwise(major0)
    // null / 'nan' content → empty sentinel (gps.py:226,258-263)
    val isNan = col("content").isNull || lower(col("content")) === "nan"
    val corrupt = parsed.getField("_corrupt_record").isNotNull
    df
      .withColumn("name",
        when(isNan, lit("not found"))
          .when(corrupt, lit("JSONDecodeError"))
          .when(b.isNull, lit("not found"))
          .otherwise(b.getField("name")))
      .withColumn("rank_order",
        when(!isNan && !corrupt && b.isNotNull, lit(0)).otherwise(lit(-1)))
      .withColumn("categories",
        when(isNan, lit("none"))
          .when(corrupt, col("content"))
          .when(b.isNull, lit("none"))
          .otherwise(concat_ws(", ", minor)))
      .withColumn("major_categories",
        when(isNan, lit("none"))
          .when(corrupt, lit("JSONDecodeError"))
          .when(b.isNull, lit("none"))
          .otherwise(concat_ws(", ", major)))
  }

  /** parse_gmap_response: strip dom hyperlinks (gps.py:344), first result
    * whose types avoid the ignored list, then the manual reduction lattice
    * (gps.py:366-441) with sets canonicalized to sorted arrays.
    */
  def parseGmap(df: DataFrame, gmapMappings: Map[String, String]): DataFrame = {
    // Stage the expensive subtrees (from_json, the non-ignored scan, the
    // branch lattice) as MATERIALIZED intermediate columns: each is
    // referenced by several downstream expressions, and CollapseProject
    // only inlines cheap expressions into multiple references — staging
    // keeps from_json evaluated once per row instead of once per output
    // column (this was a 6.8 s/100k-row query before staging).
    val cleaned = regexp_replace(col("content"), "</?a[^>]*?>", "")
    val ignored = typedlit(IgnoredPlaceTypes)
    val staged = df
      .withColumn("__parsed", from_json(cleaned, GmapSchema, JsonOpts))
      .withColumn("__firstOk", try_element_at(filter(col("__parsed").getField("results"), r =>
        size(array_intersect(r.getField("types"), ignored)) === 0), lit(1)))
    val parsed  = col("__parsed")
    val results = parsed.getField("results")
    val firstOk = col("__firstOk")
    // rank_order = 0-based index of the first non-ignored result among ALL
    // results (the reference's enumerate index, gps.py:358-360)
    val firstOkIdx = try_element_at(filter(
      zip_with(results, sequence(lit(0), size(results) - 1), (r, i) =>
        when(size(array_intersect(r.getField("types"), ignored)) === 0, i)),
      x => x.isNotNull), lit(1))

    val name   = firstOk.getField("name")
    val types0 = array_sort(array_distinct(firstOk.getField("types")))
    // remove ambiguous types (gps.py:369)
    val typesNA = array_except(types0, typedlit(Seq("point_of_interest", "establishment", "premise")))
    val mc0     = array_intersect(typesNA, typedlit(MajorTypes))
    val staged2 = staged
      .withColumn("__mcBase", when(size(mc0) > 0, mc0).otherwise(array(lit("other"))))
      .withColumn("__tmm", array_except(typesNA, typedlit(MajorTypes)))
    val mcBase  = col("__mcBase")
    val typesMinusMajor = col("__tmm")

    def g(x: Column)  = lookup(gmapMappings, x)
    def arr(s: String*) = typedlit(s.sorted)

    // name overrides + manual reduction (gps.py:380-415); each branch yields
    // (types, mc) — expressed as two parallel when-chains with identical
    // conditions
    val deptNames = Seq("Sears", "Macy's", "mygofer", "Target", "T.J. Maxx")
    def branch[T](types: Column, mc: Column)(
        onDept: (Column, Column), onFred: (Column, Column), onGas: (Column, Column),
        onLodge: (Column, Column), onTransit: (Column, Column), onHealthDoc: (Column, Column),
        onHealthStore: (Column, Column), onStoreFin: (Column, Column), onStoreGC: (Column, Column),
        onRest: (Column, Column), onFoodStore: (Column, Column), onFoodStoreGC: (Column, Column),
        default: (Column, Column), pick: ((Column, Column)) => Column): Column =
      when(name.isin(deptNames: _*), pick(onDept))
        .when(name === "Fred Meyer", pick(onFred))
        .when(array_contains(types, "gas_station"), pick(onGas))
        .when(array_contains(mc, "lodging"), pick(onLodge))
        .when(array_contains(mc, "transit_station"), pick(onTransit))
        .when(mc === arr("health", "doctor") || mc === arr("store", "health", "doctor"), pick(onHealthDoc))
        .when(array_contains(mc, "health") && array_contains(mc, "store"), pick(onHealthStore))
        .when(mc === arr("store", "finance"), pick(onStoreFin))
        .when(mc === arr("store", "general_contractor"), pick(onStoreGC))
        .when(array_contains(mc, "restaurant"), pick(onRest))
        .when(mc === arr("food", "store"), pick(onFoodStore))
        .when(mc === arr("food", "store", "general_contractor"), pick(onFoodStoreGC))
        .otherwise(pick(default))

    def mkBranches(pick: ((Column, Column)) => Column): Column = branch(typesMinusMajor, mcBase)(
      onDept = (array(lit("department_store")), mcBase),
      onFred = (array(lit("supermarket")), mcBase),
      onGas = (array(lit("gas_station")), mcBase),
      onLodge = (array(lit("lodging")), mcBase),
      onTransit = (array(lit("transit_station")), mcBase),
      onHealthDoc = (array(lit("health")), mcBase),
      onHealthStore = (array(lit("supermarket")), mcBase),
      onStoreFin = (array(lit("finance")), mcBase),
      onStoreGC = (array(lit("repair")), mcBase),
      onRest = (typesMinusMajor, array(g(lit("restaurant")))),
      onFoodStore = (typesMinusMajor, array(g(lit("supermarket")))),
      onFoodStoreGC = (array(lit("consumer_goods")), mcBase),
      default = (typesMinusMajor, mcBase),
      pick = pick)

    val staged3 = staged2
      .withColumn("__types1", mkBranches(_._1))
      .withColumn("__mc1", mkBranches(_._2))
    val types1 = col("__types1")
    val mc1    = col("__mc1")

    // take the left-most (gps.py:417-424): empty types → mc; one type → mc
    // from mapping; many → first type + its mapping
    val types2 = when(size(types1) === 0, mc1)
      .when(size(types1) === 1, types1)
      .otherwise(slice(array_sort(types1), 1, 1))
    val staged4 = staged3
      .withColumn("__mc2", when(size(types1) === 0, mc1)
        .when(size(types1) >= 1, array(g(try_element_at(array_sort(types1), lit(1))))))
    val mc2 = col("__mc2")

    val mc3 = when(size(mc2) > 1, slice(array_sort(mc2), 1, 1)).otherwise(mc2)
    val mc4 = when(mc3 === arr("store"), array(g(lit("store"))))
      .when(mc3 === arr("food"), array(g(lit("food"))))
      .otherwise(mc3)
    val types3 = when(mc4 === arr("other") && size(types2) === 0, array(lit("other"))).otherwise(types2)

    staged4
      .withColumn("name",
        when(parsed.getField("_corrupt_record").isNotNull, lit("JSONDecodeError"))
          .when(parsed.getField("error").isNotNull, parsed.getField("error"))
          .when(firstOk.isNull, lit("not found"))
          .otherwise(name))
      .withColumn("rank_order",
        when(parsed.getField("_corrupt_record").isNotNull || parsed.getField("error").isNotNull
          || firstOk.isNull, lit(-1)).otherwise(firstOkIdx.cast("int")))
      .withColumn("categories",
        when(parsed.getField("_corrupt_record").isNotNull, col("content"))
          .when(parsed.getField("error").isNotNull || firstOk.isNull, lit("none"))
          .otherwise(concat_ws(", ", types3)))
      .withColumn("major_categories",
        when(parsed.getField("_corrupt_record").isNotNull, lit("JSONDecodeError"))
          .when(parsed.getField("error").isNotNull || firstOk.isNull, lit("none"))
          .otherwise(concat_ws(", ", mc4)))
      .drop("__parsed", "__firstOk", "__mcBase", "__tmm", "__types1", "__mc1", "__mc2")
  }
}
