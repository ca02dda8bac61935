package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial scalar functions (SURVEY.md §2.9 geo tail), built from
  * codegen'd column expressions — no UDFs.
  *
  * Reference semantics re-expressed:
  *   - geoDistance: function/sql/geo/SQLFunctionGeoDistance.java —
  *     Haversine, EARTH_RADIUS_KM = 6371.0,
  *     d = 2·atan2(√a, √(1−a))·R with
  *     a = sin²(Δlat/2) + cos(lat1)·cos(lat2)·sin²(Δlon/2);
  *     units m (default) / km / mi / nmi.
  *   - dwithin: SQLFunctionGeoDWithin.java (distance ≤ threshold).
  *   - bbox contains: SQLFunctionRectangle.java + SQLFunctionGeoContains
  *     .java fast path (envelope test).
  *   - point-in-polygon: GeoUtils ray casting (odd crossing count), the
  *     polygon branch of SQLFunctionGeoContains.java.
  *
  * All math is double; the expression trees are mirrored verbatim in the
  * DuckDB oracles so both engines evaluate identical IEEE operations.
  */
object GeoFunctions {

  val EarthRadiusKm = 6371.0 // SQLFunctionGeoDistance.java EARTH_RADIUS_KM

  /** Haversine distance in km between (lon1,lat1) and (lon2,lat2).
    * sin² is an exact multiply, not pow() — Math.pow and DuckDB's pow
    * differ in the last ulp (the round-1 q_math_funcs lesson). */
  def geoDistanceKm(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column = {
    val sLat = sin(radians(lat2 - lat1) / 2)
    val sLon = sin(radians(lon2 - lon1) / 2)
    val a = sLat * sLat + cos(radians(lat1)) * cos(radians(lat2)) * sLon * sLon
    lit(2.0) * atan2(sqrt(a), sqrt(lit(1.0) - a)) * EarthRadiusKm
  }

  /** The same formula as a DuckDB SQL fragment (identical shape). */
  def geoDistanceKmSql(lon1: String, lat1: String, lon2: String, lat2: String): String = {
    val a = s"""(sin(radians($lat2 - $lat1) / 2) * sin(radians($lat2 - $lat1) / 2)
       | + cos(radians($lat1)) * cos(radians($lat2))
       |   * sin(radians($lon2 - $lon1) / 2) * sin(radians($lon2 - $lon1) / 2))"""
      .stripMargin.replace("\n", " ")
    s"(2.0 * atan2(sqrt($a), sqrt(1.0 - $a)) * $EarthRadiusKm)"
  }

  def dwithinKm(lon1: Column, lat1: Column, lon2: Column, lat2: Column, km: Double): Column =
    round(geoDistanceKm(lon1, lat1, lon2, lat2), 6) <= km

  /** Axis-aligned bounding-box containment. */
  def bboxContains(minLon: Double, minLat: Double, maxLon: Double, maxLat: Double)(
      lon: Column, lat: Column): Column =
    lon >= minLon && lon <= maxLon && lat >= minLat && lat <= maxLat

  /** Ray-casting point-in-polygon (odd number of edge crossings). The
    * polygon is a compile-time vertex list so the per-edge crossing terms
    * unroll into plain codegen'd boolean algebra. */
  def pointInPolygon(poly: Seq[(Double, Double)])(lon: Column, lat: Column): Column = {
    val crossings = poly.indices.map { i =>
      val (xi, yi) = poly(i)
      val (xj, yj) = poly((i + 1) % poly.length)
      when(
        (lit(yi) > lat) =!= (lit(yj) > lat) &&
          lon < (lit(xj - xi) * (lat - yi) / (yj - yi) + xi),
        1).otherwise(0)
    }.reduce(_ + _)
    crossings % 2 === 1
  }

  // ---- WKT constructors + measures (reference function/sql/geo/
  // SQLFunctionGeoPolygon.java / GeoUtils WKT parsing, SQLFunctionGeo
  // area/envelope measures — 28-file geo package tail). All pure column
  // expressions: a WKT string column parses distributed, no UDF. ----

  /** Parse `POINT (x y)` → struct(x, y). */
  def wktPoint(c: Column): Column = struct(
    regexp_extract(c, "POINT\\s*\\(\\s*([-+0-9.eE]+)", 1).cast("double").as("x"),
    regexp_extract(c, "POINT\\s*\\(\\s*[-+0-9.eE]+\\s+([-+0-9.eE]+)", 1).cast("double").as("y"))

  /** Parse a `POLYGON ((x y, x y, …))` outer ring → array<struct<x,y>>
    * (the closing vertex is kept, ring convention as written). */
  def wktPolygon(c: Column): Column =
    transform(split(regexp_extract(c, "POLYGON\\s*\\(\\((.*)\\)\\)", 1), ","), p => {
      val parts = split(trim(p), "\\s+")
      struct(element_at(parts, 1).cast("double").as("x"),
        element_at(parts, 2).cast("double").as("y"))
    })

  /** `POINT (x y)` text of a point struct (GeoUtils WKT emit). */
  def asText(pt: Column): Column =
    concat(lit("POINT ("), pt.getField("x"), lit(" "), pt.getField("y"), lit(")"))

  /** Shoelace area of a closed ring (planar, coordinate units²) —
    * left-to-right accumulation so the oracle can mirror the exact IEEE
    * operation order. */
  def polyArea(poly: Column): Column =
    abs(aggregate(sequence(lit(0), size(poly) - 2), lit(0.0), (acc, i) =>
      acc + (element_at(poly, i + 1).getField("x") * element_at(poly, i + 2).getField("y")
           - element_at(poly, i + 2).getField("x") * element_at(poly, i + 1).getField("y")))) / 2

  /** Axis-aligned envelope: struct(minx, miny, maxx, maxy). */
  def envelope(poly: Column): Column = struct(
    array_min(transform(poly, _.getField("x"))).as("minx"),
    array_min(transform(poly, _.getField("y"))).as("miny"),
    array_max(transform(poly, _.getField("x"))).as("maxx"),
    array_max(transform(poly, _.getField("y"))).as("maxy"))

  /** Vertex centroid over the ring's distinct vertices (closing vertex
    * dropped) — the lightweight centroid the reference's point-set path
    * computes; area-weighted centroid would follow the same fold shape. */
  def centroid(poly: Column): Column = {
    val n = size(poly) - 1
    val ring = slice(poly, lit(1), n)
    struct(
      (aggregate(ring, lit(0.0), (a, p) => a + p.getField("x")) / n).as("x"),
      (aggregate(ring, lit(0.0), (a, p) => a + p.getField("y")) / n).as("y"))
  }

  // ---- constructor tail (SQLFunctionRectangle.java, SQLFunctionCircle
  // .java, SQLFunctionLineString.java, SQLFunctionGeoBuffer.java) — all
  // produce the library's ring encoding array<struct<x,y>> (closed:
  // last vertex repeats the first) so every measure/predicate composes ----

  /** Closed axis-aligned rectangle ring. */
  def rectangleRing(x1: Column, y1: Column, x2: Column, y2: Column): Column = array(
    struct(x1.as("x"), y1.as("y")), struct(x2.as("x"), y1.as("y")),
    struct(x2.as("x"), y2.as("y")), struct(x1.as("x"), y2.as("y")),
    struct(x1.as("x"), y1.as("y")))

  /** Regular n-gon ring approximating a circle (planar radius). The
    * closing vertex is computed as k % n so the ring closes EXACTLY; the
    * axis vertices (k·2π/n at 0, π/2, π, 3π/2 for n divisible by 4) land
    * on x±r / y±r to the last ulp, so the envelope of the ring is exactly
    * [x−r, x+r] × [y−r, y+r] — the property the MBR predicates below and
    * their DuckDB oracles rely on. */
  def circleRing(x: Column, y: Column, r: Column, n: Int): Column = {
    require(n % 4 == 0, "circle vertex count must be divisible by 4 for an exact envelope")
    transform(sequence(lit(0), lit(n)), k => {
      val ang = (k % n).cast("double") * lit(2.0 * math.Pi / n)
      struct((x + r * cos(ang)).as("x"), (y + r * sin(ang)).as("y"))
    })
  }

  /** LINESTRING from parallel coordinate arrays. */
  def lineStringRing(xs: Column, ys: Column): Column =
    zip_with(xs, ys, (x, y) => struct(x.cast("double").as("x"), y.cast("double").as("y")))

  /** Planar buffer as envelope expansion: the ring's MBR grown by `r` on
    * every side (the reference's SQLFunctionGeoBuffer wraps spatial4j's
    * shape buffer; under this library's MBR predicate semantics the
    * envelope expansion is the exact counterpart). */
  def bufferRing(g: Column, r: Column): Column = {
    val xs = transform(g, _.getField("x"))
    val ys = transform(g, _.getField("y"))
    rectangleRing(array_min(xs) - r, array_min(ys) - r,
      array_max(xs) + r, array_max(ys) + r)
  }

  /** GeoJSON Polygon text of a ring (SQLFunctionGeoAsGeoJson.java). */
  def asGeoJson(g: Column): Column = concat(
    lit("{\"type\":\"Polygon\",\"coordinates\":[["),
    array_join(transform(g, p => concat(lit("["), p.getField("x").cast("string"),
      lit(","), p.getField("y").cast("string"), lit("]"))), ","),
    lit("]]}"))

  // ---- spatial predicate tail over envelopes (MBR semantics — the
  // reference's envelope fast path in SQLFunctionGeoContains.java /
  // SQLFunctionGeoIntersects.java; exact for axis-aligned shapes,
  // conservative for arbitrary rings; exact point-in-polygon remains
  // pointInPolygon above). Closed-boundary DE-9IM on boxes:
  // touches = boundary contact without interior overlap, overlaps =
  // interiors overlap with neither containing the other. ----

  private def envX(g: Column, f: String, agg: Column => Column): Column =
    agg(transform(g, _.getField(f)))

  private def envOf(g: Column): (Column, Column, Column, Column) =
    (envX(g, "x", array_min), envX(g, "y", array_min),
      envX(g, "x", array_max), envX(g, "y", array_max))

  def stIntersects(a: Column, b: Column): Column = {
    val (ax1, ay1, ax2, ay2) = envOf(a); val (bx1, by1, bx2, by2) = envOf(b)
    ax1 <= bx2 && bx1 <= ax2 && ay1 <= by2 && by1 <= ay2
  }

  def stDisjoint(a: Column, b: Column): Column = !stIntersects(a, b)

  private def interiorsOverlap(a: Column, b: Column): Column = {
    val (ax1, ay1, ax2, ay2) = envOf(a); val (bx1, by1, bx2, by2) = envOf(b)
    ax1 < bx2 && bx1 < ax2 && ay1 < by2 && by1 < ay2
  }

  def stTouches(a: Column, b: Column): Column =
    stIntersects(a, b) && !interiorsOverlap(a, b)

  def stContains(a: Column, b: Column): Column = {
    val (ax1, ay1, ax2, ay2) = envOf(a); val (bx1, by1, bx2, by2) = envOf(b)
    ax1 <= bx1 && bx2 <= ax2 && ay1 <= by1 && by2 <= ay2
  }

  def stOverlaps(a: Column, b: Column): Column =
    interiorsOverlap(a, b) && !stContains(a, b) && !stContains(b, a)

  def stEquals(a: Column, b: Column): Column = {
    val (ax1, ay1, ax2, ay2) = envOf(a); val (bx1, by1, bx2, by2) = envOf(b)
    ax1 === bx1 && ay1 === by1 && ax2 === bx2 && ay2 === by2
  }

  /** `crosses(line, g)`: the line's first→last segment passes through
    * g's interior without lying entirely inside it. Separating-axis test
    * (x-slab, y-slab, segment normal) — pure arithmetic, mirrored
    * operation-for-operation in the DuckDB oracle. */
  def stCrosses(line: Column, g: Column): Column = {
    val (bx1, by1, bx2, by2) = envOf(g)
    val p1 = element_at(line, 1); val p2 = element_at(line, size(line))
    val (x1, y1) = (p1.getField("x"), p1.getField("y"))
    val (x2, y2) = (p2.getField("x"), p2.getField("y"))
    def d(cx: Column, cy: Column): Column = (x2 - x1) * (cy - y1) - (y2 - y1) * (cx - x1)
    val ds = Seq(d(bx1, by1), d(bx2, by1), d(bx2, by2), d(bx1, by2))
    val slabReject = (x1 <= bx1 && x2 <= bx1) || (x1 >= bx2 && x2 >= bx2) ||
      (y1 <= by1 && y2 <= by1) || (y1 >= by2 && y2 >= by2)
    val normalSplit = ds.map(_ < 0).reduce(_ || _) && ds.map(_ > 0).reduce(_ || _)
    def insideStrict(px: Column, py: Column): Column =
      px > bx1 && px < bx2 && py > by1 && py < by2
    !slabReject && normalSplit && !(insideStrict(x1, y1) && insideStrict(x2, y2))
  }

  // ---- covering-cell index (reference index/geospatial/
  // GeoCoveringCellWalk.java + LSMTreeGeoIndex.java:90): points partition
  // by a coarse grid cell; a radius query enumerates the covering cells on
  // the driver (like listing Delta partitions) and the scan prunes every
  // other cell's partition. ----

  val CellDeg = 10.0

  /** Grid cell id "cx_cy" of a (lon, lat) point. */
  def cellOf(lon: Column, lat: Column): Column =
    concat(floor(lon / CellDeg).cast("int"), lit("_"), floor(lat / CellDeg).cast("int"))

  /** Driver-side haversine (same constants as [[geoDistanceKm]]). */
  def haversineKm(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val sLat = math.sin(math.toRadians(lat2 - lat1) / 2)
    val sLon = math.sin(math.toRadians(lon2 - lon1) / 2)
    val a = sLat * sLat +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) * sLon * sLon
    2.0 * math.atan2(math.sqrt(a), math.sqrt(1.0 - a)) * EarthRadiusKm
  }

  /** Cells whose minimum haversine distance to (lon0, lat0) is ≤ km.
    * The componentwise clamp of the query point into a cell's bbox is the
    * cell's nearest point (haversine is monotone in |Δlon| and |Δlat| on
    * these ranges), so the walk is exact, not approximate. Bounds cover
    * the synthetic corpus (lon ∈ [−170, 170), lat ∈ [−60, 60)). */
  def coveringCells(lon0: Double, lat0: Double, km: Double): Seq[String] =
    for {
      cx <- -17 until 17
      cy <- -6 until 6
      nearLon = math.max(cx * CellDeg, math.min(lon0, (cx + 1) * CellDeg))
      nearLat = math.max(cy * CellDeg, math.min(lat0, (cy + 1) * CellDeg))
      if haversineKm(lon0, lat0, nearLon, nearLat) <= km
    } yield s"${cx}_$cy"

  /** The same ray-cast as a DuckDB SQL fragment. */
  def pointInPolygonSql(poly: Seq[(Double, Double)], lon: String, lat: String): String = {
    val terms = poly.indices.map { i =>
      val (xi, yi) = poly(i)
      val (xj, yj) = poly((i + 1) % poly.length)
      s"""CASE WHEN (($yi > $lat) <> ($yj > $lat))
         | AND $lon < (${xj - xi} * ($lat - $yi) / ${yj - yi} + $xi)
         | THEN 1 ELSE 0 END""".stripMargin.replace("\n", " ")
    }.mkString(" + ")
    s"(($terms) % 2 = 1)"
  }
}
