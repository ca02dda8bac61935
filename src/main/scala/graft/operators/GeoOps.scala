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
      located(s, d).withColumn("cell", cellOf(col("lon"), col("lat")))
        // cluster rows by cell into few tasks BEFORE partitionBy: otherwise
        // every one of the 32 shuffle tasks opens a writer per cell it
        // touches (~370 cells × 32 tasks of tiny files — measured 18 s at
        // sf0.1; one writer per cell brings the lifecycle write to ~2 s)
        .repartition(8, col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(dir)
      val cells = coveringCells(0.0, 0.0, 3000.0)
      s.read.parquet(dir)
        .filter(col("cell").isin(cells: _*)) // partition pruning
        .withColumn("dist_km",
          round(geoDistanceKm(col("lon"), col("lat"), lit(0.0), lit(0.0)), 6))
        .filter(col("dist_km") <= 3000.0)    // exact residual predicate
        .select("id", "dist_km")
        .orderBy("id")
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
