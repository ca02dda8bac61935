package graft.operators

import graft.{Q, Tables}
import graft.functions.GeoFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Geospatial query surface (SURVEY.md §2.9 geo: 26 reference files in
  * function/sql/geo/). The test tables carry no coordinates, so each
  * entity gets a deterministic synthetic position derived from its key by
  * exact integer arithmetic (identical in both engines, two-decimal
  * coordinates → exactly representable doubles):
  *   lon = ((key·104729) mod 34000)/100 − 170   ∈ [−170, 170)
  *   lat = ((key·7919)  mod 12000)/100 − 60     ∈ [−60, 60)
  *
  * Scale design: all four operators are narrow per-row expressions or
  * equi-joined pairs — no cross joins; dwithin against a fixed point is a
  * filter pushed to the scan. At 100 TB a geo table would add an H3/S2
  * cell column as partition key (the LSMTreeGeoIndex.java:90 covering-cell
  * analog) so dwithin prunes partitions; the predicate math is unchanged.
  */
object GeoOps {

  private def lonOf(key: Column): Column = (key * 104729 % 34000) / 100.0 - 170.0
  private def latOf(key: Column): Column = (key * 7919 % 12000) / 100.0 - 60.0
  private def lonSql(k: String) = s"(($k * 104729) % 34000) / 100.0 - 170.0"
  private def latSql(k: String) = s"(($k * 7919) % 12000) / 100.0 - 60.0"

  private def located(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_custkey").as("id"),
      lonOf(col("c_custkey")).as("lon"), latOf(col("c_custkey")).as("lat"))

  private def locatedSql: String =
    s"""loc AS (SELECT c_custkey AS id, ${lonSql("c_custkey")} AS lon,
       |  ${latSql("c_custkey")} AS lat FROM customer)""".stripMargin

  /** Demo polygon: a pentagon over the mid-Atlantic. */
  private val Pentagon = Seq(
    (-40.0, -10.0), (-10.0, -20.0), (10.0, 10.0), (-15.0, 30.0), (-45.0, 15.0))

  val all: Seq[Q] = Seq(

    // ---- Haversine distance (GeoDistance, km) consecutive-id pairs ----
    Q("q_geo_distance",
      s"""WITH $locatedSql
         |SELECT a.id AS id,
         |  round(${geoDistanceKmSql("a.lon", "a.lat", "b.lon", "b.lat")}, 6) AS dist_km
         |FROM loc a JOIN loc b ON b.id = a.id + 1
         |WHERE a.id < 100 ORDER BY id""".stripMargin) { (s, d) =>
      val l = located(s, d)
      val a = l.filter(col("id") < 100)
        .select(col("id"), col("lon").as("lon1"), col("lat").as("lat1"))
      val b = l.select((col("id") - 1).as("pid"),
        col("lon").as("lon2"), col("lat").as("lat2"))
      a.join(b, col("id") === col("pid"))
        .select(col("id"),
          round(geoDistanceKm(col("lon1"), col("lat1"), col("lon2"), col("lat2")), 6)
            .as("dist_km"))
        .orderBy("id")
    },

    // ---- dwithin: all customers within 3000 km of a fixed point ----
    Q("q_geo_dwithin",
      s"""WITH $locatedSql
         |SELECT id, round(${geoDistanceKmSql("lon", "lat", "0.0", "0.0")}, 6) AS dist_km
         |FROM loc
         |WHERE round(${geoDistanceKmSql("lon", "lat", "0.0", "0.0")}, 6) <= 3000.0
         |ORDER BY id""".stripMargin) { (s, d) =>
      located(s, d)
        .withColumn("dist_km",
          round(geoDistanceKm(col("lon"), col("lat"), lit(0.0), lit(0.0)), 6))
        .filter(col("dist_km") <= 3000.0)
        .select("id", "dist_km")
        .orderBy("id")
    },

    // ---- bbox containment + per-group envelope (Rectangle/Envelope) ----
    Q("q_geo_bbox_envelope",
      s"""WITH $locatedSql,
         |boxed AS (
         |  SELECT l.id, l.lon, l.lat, c.c_nationkey AS nation
         |  FROM loc l JOIN customer c ON c.c_custkey = l.id
         |  WHERE l.lon >= -100.0 AND l.lon <= 100.0 AND l.lat >= -30.0 AND l.lat <= 30.0)
         |SELECT nation, count(*) AS n,
         |  round(min(lon), 6) AS min_lon, round(max(lon), 6) AS max_lon,
         |  round(min(lat), 6) AS min_lat, round(max(lat), 6) AS max_lat
         |FROM boxed GROUP BY nation ORDER BY nation""".stripMargin) { (s, d) =>
      val boxed = located(s, d)
        .filter(bboxContains(-100.0, -30.0, 100.0, 30.0)(col("lon"), col("lat")))
        .join(Tables.customer(s, d).select(col("c_custkey").as("id"),
          col("c_nationkey").as("nation")), Seq("id"))
      boxed.groupBy("nation")
        .agg(count(lit(1)).as("n"),
          round(min(col("lon")), 6).as("min_lon"), round(max(col("lon")), 6).as("max_lon"),
          round(min(col("lat")), 6).as("min_lat"), round(max(col("lat")), 6).as("max_lat"))
        .orderBy("nation")
    },

    // ---- point-in-polygon (GeoContains polygon branch, ray casting) ----
    Q("q_geo_polygon_contains",
      s"""WITH $locatedSql
         |SELECT id, round(lon, 6) AS lon, round(lat, 6) AS lat
         |FROM loc
         |WHERE ${pointInPolygonSql(Pentagon, "lon", "lat")}
         |ORDER BY id""".stripMargin) { (s, d) =>
      located(s, d)
        .filter(pointInPolygon(Pentagon)(col("lon"), col("lat")))
        .select(col("id"), round(col("lon"), 6).as("lon"), round(col("lat"), 6).as("lat"))
        .orderBy("id")
    },

    // ---- covering-cell-pruned dwithin: the cell-partitioned layout +
    //      driver-side covering-cell walk answers the same radius query as
    //      q_geo_dwithin while scanning only intersecting cells ----
    Q("q_geo_cell_dwithin",
      s"""WITH $locatedSql
         |SELECT id, round(${geoDistanceKmSql("lon", "lat", "0.0", "0.0")}, 6) AS dist_km
         |FROM loc
         |WHERE round(${geoDistanceKmSql("lon", "lat", "0.0", "0.0")}, 6) <= 3000.0
         |ORDER BY id""".stripMargin) { (s, d) =>
      val dir = s"/tmp/graft_state/geocells_${d.replaceAll("[^A-Za-z0-9]", "_")}"
      graft.sources.LayoutOnce.ensure(dir, graft.sources.LayoutOnce.srcFingerprint(s"$d/customer.parquet"), "geocells-r8-v1") {
        located(s, d).withColumn("cell", cellOf(col("lon"), col("lat")))
          // cluster rows by cell into few tasks BEFORE partitionBy: otherwise
          // every one of the 32 shuffle tasks opens a writer per cell it
          // touches (~370 cells × 32 tasks of tiny files — measured 18 s at
          // sf0.1; one writer per cell brings the lifecycle write to ~2 s)
          .repartition(8, col("cell"))
          .write.mode("overwrite").partitionBy("cell").parquet(dir)
      }
      val cells = coveringCells(0.0, 0.0, 3000.0)
      s.read.parquet(dir)
        .filter(col("cell").isin(cells: _*)) // partition pruning
        .withColumn("dist_km",
          round(geoDistanceKm(col("lon"), col("lat"), lit(0.0), lit(0.0)), 6))
        .filter(col("dist_km") <= 3000.0)    // exact residual predicate
        .select("id", "dist_km")
        .orderBy("id")
    },

    // ---- geo predicate + constructor tail through the SQL registry
    //      (st_rectangle/circle/linestring/buffer + intersects/disjoint/
    //      touches/overlaps/within/equals/crosses + GeoJSON out). MBR
    //      predicate semantics (the reference's envelope fast path); the
    //      oracle is the same interval algebra, and the crosses test is
    //      the separating-axis formula mirrored operation-for-operation.
    //      Data: per-customer rectangle [lon,lat]..[lon+dx,lat+dy] vs the
    //      fixed query box [-60,-25]..[-10,25]. ----
    Q("q_geo_predicates", {
      val d1 = "((x2 - x1) * (-25.0 - y1) - (y2 - y1) * (-60.0 - x1))"
      val d2 = "((x2 - x1) * (-25.0 - y1) - (y2 - y1) * (-10.0 - x1))"
      val d3 = "((x2 - x1) * (25.0 - y1) - (y2 - y1) * (-10.0 - x1))"
      val d4 = "((x2 - x1) * (25.0 - y1) - (y2 - y1) * (-60.0 - x1))"
      val slab = """((x1 <= -60.0 AND x2 <= -60.0) OR (x1 >= -10.0 AND x2 >= -10.0)
        | OR (y1 <= -25.0 AND y2 <= -25.0) OR (y1 >= 25.0 AND y2 >= 25.0))""".stripMargin
      val split = s"""(($d1 < 0 OR $d2 < 0 OR $d3 < 0 OR $d4 < 0)
        | AND ($d1 > 0 OR $d2 > 0 OR $d3 > 0 OR $d4 > 0))""".stripMargin
      def ins(px: String, py: String) =
        s"($px > -60.0 AND $px < -10.0 AND $py > -25.0 AND $py < 25.0)"
      s"""WITH t AS (SELECT c_custkey AS id,
         |    ((c_custkey * 104729) % 34000) / 100.0 - 170.0 AS lon,
         |    ((c_custkey * 7919) % 12000) / 100.0 - 60.0 AS lat,
         |    (c_custkey % 5 + 1) * 1.0 AS dx,
         |    (c_custkey % 3 + 1) * 1.0 AS dy
         |  FROM customer WHERE c_custkey < 300),
         |r AS (SELECT id, lon, lat, lon AS ax1, lat AS ay1,
         |    lon + dx AS ax2, lat + dy AS ay2,
         |    lon AS x1, lat AS y1, lon + 3 * dx AS x2, lat + 3 * dy AS y2 FROM t)
         |SELECT id,
         |  (ax1 <= -10.0 AND -60.0 <= ax2 AND ay1 <= 25.0 AND -25.0 <= ay2) AS inter,
         |  NOT (ax1 <= -10.0 AND -60.0 <= ax2 AND ay1 <= 25.0 AND -25.0 <= ay2) AS disj,
         |  ((ax1 <= -10.0 AND -60.0 <= ax2 AND ay1 <= 25.0 AND -25.0 <= ay2)
         |    AND NOT (ax1 < -10.0 AND -60.0 < ax2 AND ay1 < 25.0 AND -25.0 < ay2)) AS tch,
         |  ((ax1 < -10.0 AND -60.0 < ax2 AND ay1 < 25.0 AND -25.0 < ay2)
         |    AND NOT (ax1 <= -60.0 AND -10.0 <= ax2 AND ay1 <= -25.0 AND 25.0 <= ay2)
         |    AND NOT (-60.0 <= ax1 AND ax2 <= -10.0 AND -25.0 <= ay1 AND ay2 <= 25.0)) AS ovl,
         |  (-60.0 <= ax1 AND ax2 <= -10.0 AND -25.0 <= ay1 AND ay2 <= 25.0) AS w_in,
         |  (ax1 - 5.0 <= -10.0 AND -60.0 <= ax2 + 5.0
         |    AND ay1 - 5.0 <= 25.0 AND -25.0 <= ay2 + 5.0) AS binter,
         |  (lon - 10.0 <= -10.0 AND -60.0 <= lon + 10.0
         |    AND lat - 10.0 <= 25.0 AND -25.0 <= lat + 10.0) AS cinter,
         |  (NOT $slab AND $split AND NOT (${ins("x1", "y1")} AND ${ins("x2", "y2")})) AS crx,
         |  TRUE AS eqv
         |FROM r ORDER BY id""".stripMargin
    }) { (s, d) =>
      graft.sql.GraftSql.query(s, d,
        """SELECT c_custkey AS id,
          | st_intersects(a, q) AS inter,
          | st_disjoint(a, q) AS disj,
          | st_touches(a, q) AS tch,
          | st_overlaps(a, q) AS ovl,
          | st_within(a, q) AS w_in,
          | st_intersects(st_buffer(a, 5.0), q) AS binter,
          | st_intersects(st_circle(lon, lat, 10.0, 8), q) AS cinter,
          | st_crosses(st_linestring([lon, lon + 3 * dx], [lat, lat + 3 * dy]), q) AS crx,
          | st_equals(a, st_buffer(a, 0.0)) AS eqv
          | FROM customer
          | LET lon = (c_custkey * 104729 % 34000) / 100.0 - 170.0,
          |     lat = (c_custkey * 7919 % 12000) / 100.0 - 60.0,
          |     dx = (c_custkey % 5 + 1) * 1.0,
          |     dy = (c_custkey % 3 + 1) * 1.0,
          |     a = st_rectangle(lon, lat, lon + dx, lat + dy),
          |     q = st_rectangle(-60.0, -25.0, -10.0, 25.0)
          | WHERE c_custkey < 300 ORDER BY id""".stripMargin.replace("\n", ""))
    },

    // ---- GeoJSON out: constructor → JSON text round-trip ----
    Q("q_geo_geojson",
      """SELECT c_custkey AS id,
        |  '{"type":"Polygon","coordinates":[[['
        |    || lon::VARCHAR || ',' || lat::VARCHAR || '],['
        |    || (lon + 1.0)::VARCHAR || ',' || lat::VARCHAR || '],['
        |    || (lon + 1.0)::VARCHAR || ',' || (lat + 1.0)::VARCHAR || '],['
        |    || lon::VARCHAR || ',' || (lat + 1.0)::VARCHAR || '],['
        |    || lon::VARCHAR || ',' || lat::VARCHAR || ']]]}' AS gj
        |FROM (SELECT c_custkey,
        |    ((c_custkey * 104729) % 34000) / 100.0 - 170.0 AS lon,
        |    ((c_custkey * 7919) % 12000) / 100.0 - 60.0 AS lat
        |  FROM customer WHERE c_custkey < 50)
        |ORDER BY id""".stripMargin) { (s, d) =>
      graft.sql.GraftSql.query(s, d,
        """SELECT c_custkey AS id,
          | st_asgeojson(st_rectangle(lon, lat, lon + 1.0, lat + 1.0)) AS gj
          | FROM customer
          | LET lon = (c_custkey * 104729 % 34000) / 100.0 - 170.0,
          |     lat = (c_custkey * 7919 % 12000) / 100.0 - 60.0
          | WHERE c_custkey < 50 ORDER BY id""".stripMargin.replace("\n", ""))
    },

    // ---- WKT round-trip + measures (geomFromText / area / envelope /
    //      centroid): each row BUILDS a POLYGON WKT string, parses it back
    //      with wktPolygon, and measures the parsed ring — the oracle
    //      computes the same measures directly from the coordinates with
    //      the identical IEEE operation order ----
    Q("q_geo_wkt",
      s"""WITH $locatedSql,
         |t AS (SELECT id, lon, lat,
         |        CAST(id % 5 + 1 AS DOUBLE) AS dx, CAST(id % 3 + 1 AS DOUBLE) AS dy
         |      FROM loc WHERE id < 50),
         |v AS (SELECT id, lon AS x1, lat AS y1, lon + dx AS x2, lat AS y2,
         |        lon + 1.0 AS x3, lat + dy AS y3 FROM t)
         |SELECT id,
         |  round(abs(((0.0 + (x1*y2 - x2*y1)) + (x2*y3 - x3*y2)) + (x3*y1 - x1*y3)) / 2, 6) AS area,
         |  round(least(x1, x2, x3), 6) AS minx, round(least(y1, y2, y3), 6) AS miny,
         |  round(greatest(x1, x2, x3), 6) AS maxx, round(greatest(y1, y2, y3), 6) AS maxy,
         |  round((((0.0 + x1) + x2) + x3) / 3, 6) AS cx,
         |  round((((0.0 + y1) + y2) + y3) / 3, 6) AS cy
         |FROM v ORDER BY id""".stripMargin) { (s, d) =>
      val withWkt = located(s, d).filter(col("id") < 50)
        .withColumn("dx", (col("id") % 5 + 1).cast("double"))
        .withColumn("dy", (col("id") % 3 + 1).cast("double"))
        .withColumn("wkt", concat(lit("POLYGON (("),
          col("lon"), lit(" "), col("lat"), lit(", "),
          col("lon") + col("dx"), lit(" "), col("lat"), lit(", "),
          col("lon") + 1.0, lit(" "), col("lat") + col("dy"), lit(", "),
          col("lon"), lit(" "), col("lat"), lit("))")))
        .withColumn("poly", wktPolygon(col("wkt")))
        .withColumn("env", envelope(col("poly")))
        .withColumn("cen", centroid(col("poly")))
      withWkt.select(col("id"),
        round(polyArea(col("poly")), 6).as("area"),
        round(col("env.minx"), 6).as("minx"), round(col("env.miny"), 6).as("miny"),
        round(col("env.maxx"), 6).as("maxx"), round(col("env.maxy"), 6).as("maxy"),
        round(col("cen.x"), 6).as("cx"), round(col("cen.y"), 6).as("cy"))
        .orderBy("id")
    }
  )
}
