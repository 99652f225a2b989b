package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class GeoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic scattered points: (id, lat, lon) over the whole globe
  private lazy val pts = spark.range(0, 2000).select(
    col("id"),
    (pmod(xxhash64(col("id"), lit(1)), lit(100000)) / 100000.0 * 170.0 - 85.0).as("lat"),
    (pmod(xxhash64(col("id"), lit(2)), lit(100000)) / 100000.0 * 360.0 - 180.0).as("lon"))

  test("haversineKm matches known distances") {
    val d = Seq((48.8566, 2.3522, 51.5074, -0.1278)) // Paris -> London
      .toDF("a", "b", "c", "e")
      .select(Geo.haversineKm($"a", $"b", $"c", $"e")).as[Double].head()
    assert(math.abs(d - 343.6) < 1.0, s"Paris-London was $d km")
    // zero distance, symmetry, and the antipodal max (half circumference)
    val z = Seq((10.0, 20.0)).toDF("a", "b")
      .select(Geo.haversineKm($"a", $"b", $"a", $"b")).as[Double].head()
    assert(z == 0.0)
    val anti = Seq((0.0, 0.0, 0.0, 180.0)).toDF("a", "b", "c", "e")
      .select(Geo.haversineKm($"a", $"b", $"c", $"e")).as[Double].head()
    assert(math.abs(anti - math.Pi * Geo.EarthRadiusKm) < 1e-6)
  }

  test("geoDistance == brute-force haversine filter (box is a true superset)") {
    for ((cLat, cLon, r) <- Seq((40.0, -74.0, 1500.0), // mid-lat
                                (75.0, 10.0, 2500.0),  // cap over the pole
                                (-10.0, 179.0, 1200.0))) { // antimeridian wrap
      val fast = Geo.geoDistance(pts, "lat", "lon", cLat, cLon, r)
        .select("id").as[Long].collect().toSet
      val brute = pts
        .withColumn("dk", Geo.haversineKm($"lat", $"lon", lit(cLat), lit(cLon)))
        .filter($"dk" <= r).select("id").as[Long].collect().toSet
      assert(fast == brute, s"center=($cLat,$cLon) r=$r")
      assert(brute.nonEmpty, s"degenerate test: no points near ($cLat,$cLon)")
    }
  }

  test("capBoundingBox never clips a point inside the radius") {
    // dense ring of points AT the radius boundary (worst case for the box)
    val c = (37.0, 122.0); val r = 800.0
    val ring = spark.range(0, 720).select(
      (col("id") * 0.5).as("bearing")).select(
      // destination point along each bearing at exactly 0.999r
      (asin(sin(radians(lit(c._1))) * cos(lit(0.999 * r / Geo.EarthRadiusKm)) +
        cos(radians(lit(c._1))) * sin(lit(0.999 * r / Geo.EarthRadiusKm)) *
          cos(radians(col("bearing")))) * 180.0 / math.Pi).as("lat"),
      col("bearing"))
    val (top, left, bottom, right) = Geo.capBoundingBox(c._1, c._2, r)
    // every ring latitude inside the box's lat range
    val bad = ring.filter(col("lat") > top || col("lat") < bottom).count()
    assert(bad == 0)
  }

  test("geotile x/y match the slippy-map reference cells") {
    def tile(lat: Double, lon: Double, z: Int): (Long, Long) =
      Seq((lat, lon)).toDF("lat", "lon")
        .select(Geo.geotileX($"lon", z), Geo.geotileY($"lat", z))
        .as[(Long, Long)].head()
    assert(tile(0.0, 0.0, 1) == ((1L, 1L)))       // equator/prime meridian
    assert(tile(51.5, -0.13, 10) == ((511L, 340L))) // London z10 (OSM ref)
    assert(tile(89.9, 0.0, 4) == ((8L, 0L)))      // beyond mercator: clamp N
    assert(tile(-89.9, 0.0, 4) == ((8L, 15L)))    // clamp S
    assert(tile(0.0, 180.0, 4) == ((15L, 8L)))    // lon=+180 stays in range
    assert(tile(0.0, -180.0, 4) == ((0L, 8L)))
  }

  test("geoDistanceRings partitions the input and ring indexes follow distance") {
    val edges = Seq(2000.0, 5000.0, 10000.0)
    val g = Geo.geoDistanceRings(pts, "lat", "lon", 40.0, -74.0, edges,
      Seq(count(lit(1)).as("n")))
    assert(g.agg(sum("n")).as[Long].head() == 2000L)
    assert(g.filter($"ring" < 0 || $"ring" > edges.size).count() == 0)
    // independently recompute each point's ring
    val check = pts
      .withColumn("dk", Geo.haversineKm($"lat", $"lon", lit(40.0), lit(-74.0)))
      .withColumn("want", edges.map(e => ($"dk" >= e).cast("long")).reduce(_ + _))
      .groupBy("want").agg(count(lit(1)).as("n"))
    val a = g.orderBy("ring").as[(Long, Long)].collect().toSeq
    val b = check.orderBy("want").as[(Long, Long)].collect().toSeq
    assert(a == b)
  }

  test("geohashEncode matches published reference hashes") {
    def gh(lat: Double, lon: Double, p: Int): String =
      Seq((lat, lon)).toDF("lat", "lon")
        .select(Geo.geohashEncode($"lat", $"lon", p)).as[String].head()
    // the canonical worked example (Jutland, Wikipedia's geohash article)
    assert(gh(57.64911, 10.40744, 4) == "u4pr")
    assert(gh(57.64911, 10.40744, 6) == "u4pruy")
    assert(gh(57.64911, 10.40744, 11) == "u4pruydqqvj")
    // Curitiba example, southern/western hemispheres
    assert(gh(-25.382708, -49.265506, 8) == "6gkzwgjz")
    // origin and the clamped corners of the grid
    assert(gh(0.0, 0.0, 3) == "s00")
    assert(gh(90.0, 180.0, 4) == "zzzz")
    assert(gh(-90.0, -180.0, 4) == "0000")
  }

  test("geohashGrid counts partition the input; keys re-encode per-row") {
    val g = Geo.geohashGrid(pts, "lat", "lon", precision = 2,
      Seq(count(lit(1)).as("n")))
    assert(g.agg(sum("n")).as[Long].head() == 2000L)
    // every bucket's key equals the per-row encode of its members
    val perRow = pts.withColumn("geohash", Geo.geohashEncode($"lat", $"lon", 2))
      .groupBy("geohash").agg(count(lit(1)).as("n"))
    val a = g.orderBy("geohash").as[(Long, String)].collect().toSeq
    val b = perRow.orderBy("geohash").select("n", "geohash")
      .as[(Long, String)].collect().toSeq
    assert(a == b)
  }

  test("geoCentroid and geoBounds match hand-computed group values") {
    val df = Seq((1, 10.0, 20.0), (1, 30.0, -40.0), (2, -5.0, 170.0))
      .toDF("g", "lat", "lon")
    val c = Geo.geoCentroid(df, "lat", "lon", Seq($"g")).orderBy("g")
      .as[(Int, Double, Double, Long)].collect().toSeq
    assert(c == Seq((1, 20.0, -10.0, 2L), (2, -5.0, 170.0, 1L)))
    val b = Geo.geoBounds(df, "lat", "lon", Seq($"g")).orderBy("g")
      .as[(Int, Double, Double, Double, Double)].collect().toSeq
    assert(b == Seq((1, 30.0, 10.0, -40.0, 20.0), (2, -5.0, -5.0, 170.0, 170.0)))
    // global (no groupBy) forms
    assert(Geo.geoCentroid(df, "lat", "lon").select("count").as[Long].head() == 3L)
    assert(Geo.geoBounds(df, "lat", "lon").select("top").as[Double].head() == 30.0)
  }

  test("geoPolygon == brute-force ray cast; concave shape; bbox is a superset") {
    // concave pentagon (an inward notch at (40, -80)), lat/lon pairs
    val poly = Seq((50.0, -100.0), (60.0, -60.0), (30.0, -50.0),
      (40.0, -80.0), (20.0, -110.0))
    def bruteInside(lat: Double, lon: Double): Boolean = {
      val edges = poly.zip(poly.tail :+ poly.head)
      var c = 0
      for (((y1, x1), (y2, x2)) <- edges if y1 != y2)
        if (((y1 > lat) != (y2 > lat)) &&
            lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1) c += 1
      c % 2 == 1
    }
    val got = Geo.geoPolygon(pts, "lat", "lon", poly)
      .select("id").as[Long].collect().toSet
    val all = pts.select("id", "lat", "lon").as[(Long, Double, Double)].collect()
    val brute = all.collect { case (id, la, lo) if bruteInside(la, lo) => id }.toSet
    assert(got == brute)
    assert(brute.nonEmpty, "degenerate test: no points inside the polygon")
    // the concavity matters: some point is inside the vertex bbox yet
    // outside the polygon (the notch), so the ray cast is load-bearing
    val inBoxOnly = all.count { case (_, la, lo) =>
      la >= 20.0 && la <= 60.0 && lo >= -110.0 && lo <= -50.0 &&
        !bruteInside(la, lo) }
    assert(inBoxOnly > 0, "polygon degenerated to its bbox")
    // a horizontal-edged rectangle still works (dy=0 edges dropped)
    val rect = Seq((10.0, 0.0), (10.0, 40.0), (-10.0, 40.0), (-10.0, 0.0))
    val rGot = Geo.geoPolygon(pts, "lat", "lon", rect)
      .select("id").as[Long].collect().toSet
    val rBrute = all.collect { case (id, la, lo) // half-open: bottom edge in
      if la >= -10.0 && la < 10.0 && lo >= 0.0 && lo < 40.0 => id }.toSet
    assert(rGot == rBrute)
    intercept[IllegalArgumentException] {
      Geo.pointInPolygon($"lat", $"lon", Seq((0.0, 0.0), (1.0, 1.0)))
    }
    intercept[IllegalArgumentException] { // all-horizontal degenerate
      Geo.pointInPolygon($"lat", $"lon",
        Seq((5.0, 0.0), (5.0, 10.0), (5.0, 20.0)))
    }
    // bbox prefilter reaches the parquet scan here too
    val dir = java.nio.file.Files.createTempDirectory("geo-poly-pushdown").toString
    pts.write.mode("overwrite").parquet(dir)
    val pushed = Geo.geoPolygon(spark.read.parquet(dir), "lat", "lon", poly)
      .queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metadata.getOrElse("PushedFilters", "")
      }.mkString
    assert(pushed.contains("GreaterThanOrEqual(lat") &&
      pushed.contains("LessThanOrEqual(lon"), pushed)
  }

  test("bounding-box prefilter reaches the parquet scan as PushedFilters") {
    val dir = java.nio.file.Files.createTempDirectory("geo-pushdown").toString
    pts.write.mode("overwrite").parquet(dir)
    val q = Geo.geoDistance(spark.read.parquet(dir), "lat", "lon",
      40.0, -74.0, 1500.0)
    // the four range predicates must be pushed to the scan (row-group
    // pruning via column min/max at scale), not applied post-scan only.
    // Read the scan node's own metadata — the rendered plan string
    // truncates long filter lists with "..."
    val pushed = q.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metadata.getOrElse("PushedFilters", "")
    }.mkString
    assert(pushed.contains("GreaterThanOrEqual(lat") &&
      pushed.contains("LessThanOrEqual(lat"), pushed)
    assert(pushed.contains("GreaterThanOrEqual(lon") &&
      pushed.contains("LessThanOrEqual(lon"), pushed)
  }

  test("geotileGrid counts partition the input exactly") {
    val g = Geo.geotileGrid(pts, "lat", "lon", zoom = 2,
      Seq(count(lit(1)).as("n")))
    val total = g.agg(sum("n")).as[Long].head()
    assert(total == 2000L)
    val outOfRange = g.filter($"tile_x" < 0 || $"tile_x" > 3 ||
      $"tile_y" < 0 || $"tile_y" > 3).count()
    assert(outOfRange == 0)
  }

  // deterministic per-row CONCAVE pentagons: hashed center + anisotropic
  // radii scaling a fixed offset pattern whose 4th vertex pulls inward
  private lazy val shapes = {
    val offsets = Seq((2.0, 0.0), (0.0, 2.0), (-2.0, 0.0), (0.1, 0.1), (0.0, -2.0))
    spark.range(0, 800).select(col("id"),
      (pmod(xxhash64(col("id"), lit(11)), lit(100000)) / 100000.0 * 140.0 - 70.0).as("clat"),
      (pmod(xxhash64(col("id"), lit(12)), lit(100000)) / 100000.0 * 340.0 - 170.0).as("clon"),
      (pmod(xxhash64(col("id"), lit(13)), lit(100000)) / 100000.0 * 5.0 + 0.5).as("r1"),
      (pmod(xxhash64(col("id"), lit(14)), lit(100000)) / 100000.0 * 5.0 + 0.5).as("r2"))
      .select(col("id"), array(offsets.map { case (dy, dx) =>
        struct((col("clat") + lit(dy) * col("r1")).as("lat"),
          (col("clon") + lit(dx) * col("r2")).as("lon")) }: _*).as("shape"))
  }

  // driver-side reference relations, formula-identical to Geo's
  private def refInside(poly: Seq[(Double, Double)], lat: Double, lon: Double): Boolean = {
    val edges = poly.zip(poly.tail :+ poly.head)
    var c = 0
    for (((y1, x1), (y2, x2)) <- edges if y1 != y2)
      if (((y1 > lat) != (y2 > lat)) &&
          lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1) c += 1
    c % 2 == 1
  }
  private def refCross(y1: Double, x1: Double, y2: Double, x2: Double,
                       cy1: Double, cx1: Double, cy2: Double, cx2: Double): Boolean = {
    def o(ax: Double, ay: Double, bx: Double, by: Double, cx: Double, cy: Double) =
      (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    o(x1, y1, x2, y2, cx1, cy1) * o(x1, y1, x2, y2, cx2, cy2) < 0 &&
    o(cx1, cy1, cx2, cy2, x1, y1) * o(cx1, cy1, cx2, cy2, x2, y2) < 0
  }
  private def refRelations(poly: Seq[(Double, Double)], q: Geo.QEnvelope) = {
    val inBox = poly.map { case (la, lo) =>
      la <= q.top && la >= q.bottom && lo >= q.left && lo <= q.right }
    val corners = Seq((q.top, q.left), (q.top, q.right),
      (q.bottom, q.left), (q.bottom, q.right))
    val cornerIn = corners.map { case (y, x) => refInside(poly, y, x) }
    val edges = poly.zip(poly.tail :+ poly.head)
    val sides = Seq((q.top, q.left, q.top, q.right),
      (q.bottom, q.left, q.bottom, q.right),
      (q.bottom, q.left, q.top, q.left),
      (q.bottom, q.right, q.top, q.right))
    val edgeCross = edges.exists { case ((y1, x1), (y2, x2)) =>
      sides.exists { case (a, b, c2, d) => refCross(y1, x1, y2, x2, a, b, c2, d) } }
    val intersects = inBox.exists(identity) || cornerIn.exists(identity) || edgeCross
    (intersects, inBox.forall(identity), cornerIn.forall(identity) && !edgeCross)
  }

  test("geoShape point + envelope relations == brute force; disjoint complements") {
    val all = shapes.select(col("id"), col("shape"))
      .as[(Long, Seq[(Double, Double)])].collect()
    // point query: intersects == the per-row ray cast
    val p = (12.3456, -7.8912)
    val gotP = Geo.geoShape(shapes, "shape", Geo.QPoint(p._1, p._2))
      .select("id").as[Long].collect().toSet
    val bruteP = all.collect { case (id, poly) if refInside(poly, p._1, p._2) => id }.toSet
    assert(gotP == bruteP && bruteP.nonEmpty)
    // envelope relations against the brute-force reference
    val q = Geo.QEnvelope(top = 30.0, left = -40.0, bottom = -10.0, right = 20.0)
    val ref = all.map { case (id, poly) => id -> refRelations(poly, q) }.toMap
    val gotI = Geo.geoShape(shapes, "shape", q, "intersects")
      .select("id").as[Long].collect().toSet
    val gotD = Geo.geoShape(shapes, "shape", q, "disjoint")
      .select("id").as[Long].collect().toSet
    val gotW = Geo.geoShape(shapes, "shape", q, "within")
      .select("id").as[Long].collect().toSet
    assert(gotI == ref.collect { case (id, (i, _, _)) if i => id }.toSet)
    assert(gotW == ref.collect { case (id, (_, w, _)) if w => id }.toSet)
    assert(gotI.nonEmpty && gotW.nonEmpty, "degenerate envelope fixture")
    // disjoint is the exact complement of intersects
    assert(gotD == all.map(_._1).toSet -- gotI)
    // within implies intersects
    assert(gotW.subsetOf(gotI))
    // contains: a small box some polygon swallows whole
    val qs = Geo.QEnvelope(top = 0.6, left = -0.3, bottom = 0.4, right = 0.3)
    val gotC = Geo.geoShape(shapes, "shape", qs, "contains")
      .select("id").as[Long].collect().toSet
    val refC = all.map { case (id, poly) => id -> refRelations(poly, qs) }
      .collect { case (id, (_, _, c)) if c => id }.toSet
    assert(gotC == refC && refC.nonEmpty, s"contains degenerate: $refC")
    intercept[IllegalArgumentException] {
      Geo.geoShape(shapes, "shape", Geo.QPoint(0, 0), "within")
    }
    intercept[IllegalArgumentException] {
      Geo.geoShape(shapes, "shape", q, "overlaps")
    }
  }

  test("geoShape bounds columns: same answers, range filters push down") {
    val dir = java.nio.file.Files.createTempDirectory("geo-shape-pushdown").toString
    Geo.withShapeBounds(shapes, "shape").write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val bc = Some(("shape_top", "shape_left", "shape_bottom", "shape_right"))
    val q = Geo.QEnvelope(top = 30.0, left = -40.0, bottom = -10.0, right = 20.0)
    for (rel <- Seq("intersects", "disjoint", "within")) {
      val a = Geo.geoShape(shapes, "shape", q, rel).select("id").as[Long].collect().toSet
      val b = Geo.geoShape(stored, "shape", q, rel, boundsCols = bc)
        .select("id").as[Long].collect().toSet
      assert(a == b, s"relation $rel diverged with bounds columns")
    }
    // the coarse test reaches the scan as PushedFilters on the flat cols
    val plan = Geo.geoShape(stored, "shape", q, "intersects", boundsCols = bc)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("shape_top"), plan)
  }
}
