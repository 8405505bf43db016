"""Spatial operators: grid-bucketed proximity join (geo family).

No table in the schema carries coordinates, so points are derived
deterministically from the customer key (md5 -> uniform lat/lon — the
sampling family's derandomization protocol); on a real table the same
operators run over its geometry columns. What matters here is the JOIN
SHAPE, which is the standard scale answer for "find nearby pairs" (the
geohash / H3 / S2 bucketing every spatial engine uses — e.g. Apache Sedona
partitions the same way):

- assign each point to an integer grid cell sized to the search radius;
- replicate each point into its cell + 8 neighbors (constant 9x blowup);
- equi-join on the cell id — candidate pairs are only points within one
  cell of each other, NEVER the n² cross join;
- verify candidates with the exact haversine distance.

Determinism/portability: cell ids are exact integer floor divisions; the
derived coordinates are dyadic rationals (exact in doubles); haversine's
sin/cos/asin run on identical inputs on both engines with the result
6-dp-quantized (the libm last-ulp spread is absorbed — KL convention).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from fpl_data_pipeline_spark.registry import register
from fpl_data_pipeline_spark.tables import table

GEO_CELL_DEG = 1.0  # grid pitch in degrees; search radius <= one cell
EARTH_KM = 6371.0
# Hot-cell guard: a cell with P points contributes ~P^2/2 candidates; one
# urban-density cell can straggle the whole join. Cells above the cap are
# excluded from candidate generation on BOTH engines (production systems
# instead sub-divide the cell — H3 resolution step — which preserves
# recall; the cap documents the bound the coarse grid needs). Far above
# any cell this corpus produces, so results here are unchanged. Point
# DENSIFICATION inherently grows true close-pair counts quadratically —
# output size, not wasted work (scale-probe note in BENCH_NOTES).
GEO_CELL_CAP = 10000


def grid_neighbor_pairs(
    pts: DataFrame, id_col: str, lat: str, lon: str, cell_deg: float
) -> DataFrame:
    """(id_a, id_b, lat/lon both sides) candidate pairs from the 3x3
    neighbor-cell equi-join; id_a < id_b. ``pts`` columns are preserved
    through aliased copies."""
    cx = F.floor(F.col(lon) / cell_deg).cast("long")
    cy = F.floor(F.col(lat) / cell_deg).cast("long")
    # left side replicated into its 9-cell neighborhood; right side stays
    # in its home cell -> each nearby pair meets in exactly the right cell
    a = (
        pts.select(
            F.col(id_col).alias("id_a"),
            F.col(lat).alias("lat_a"),
            F.col(lon).alias("lon_a"),
            cx.alias("cx"),
            cy.alias("cy"),
        )
        .withColumn("dx", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .withColumn("dy", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .select(
            "id_a",
            "lat_a",
            "lon_a",
            (F.col("cx") + F.col("dx")).alias("jx"),
            (F.col("cy") + F.col("dy")).alias("jy"),
        )
    )
    b = pts.select(
        F.col(id_col).alias("id_b"),
        F.col(lat).alias("lat_b"),
        F.col(lon).alias("lon_b"),
        F.floor(F.col(lon) / cell_deg).cast("long").alias("jx"),
        F.floor(F.col(lat) / cell_deg).cast("long").alias("jy"),
    )
    occ = b.groupBy("jx", "jy").agg(F.count(F.lit(1)).alias("occ"))
    b = b.join(occ, ["jx", "jy"]).filter(F.col("occ") <= GEO_CELL_CAP).drop("occ")
    return a.join(b, ["jx", "jy"]).filter(F.col("id_a") < F.col("id_b")).select(
        "id_a", "id_b", "lat_a", "lon_a", "lat_b", "lon_b"
    )


def haversine_km(lat_a, lon_a, lat_b, lon_b):
    """Great-circle distance in km (column expression)."""
    rad = 3.141592653589793 / 180.0
    dlat = (lat_b - lat_a) * rad / 2
    dlon = (lon_b - lon_a) * rad / 2
    h = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(lat_a * rad) * F.cos(lat_b * rad) * F.sin(dlon) * F.sin(dlon)
    )
    return F.lit(2 * EARTH_KM) * F.asin(F.sqrt(h))


# md5-derived coordinates: two independent 40-bit uniforms -> lat in
# [-60, 60), lon in [-180, 180) (polar caps excluded so the fixed-pitch
# lon grid stays a valid bucketing)
_LAT_SQL = "(CAST(('0x' || substr(md5('lat:' || c_custkey), 1, 10)) AS BIGINT) / 1099511627776.0 * 120 - 60)"
_LON_SQL = "(CAST(('0x' || substr(md5('lon:' || c_custkey), 1, 10)) AS BIGINT) / 1099511627776.0 * 360 - 180)"


def customer_points(c: DataFrame) -> DataFrame:
    """(id, lat, lon) md5-derived synthetic coordinates per customer — the
    keyed relation under geo_proximity_pairs, split out so
    candidate_cap_audit can report GEO_CELL_CAP drops from the same code."""
    u = lambda tag: (  # noqa: E731
        F.conv(
            F.substring(F.md5(F.concat(F.lit(tag + ":"), F.col("c_custkey"))), 1, 10),
            16,
            10,
        ).cast("double")
        / F.lit(1099511627776.0)
    )
    return c.select(
        F.col("c_custkey").alias("id"),
        (u("lat") * 120 - 60).alias("lat"),
        (u("lon") * 360 - 180).alias("lon"),
    )


@register(
    "geo_proximity_pairs",
    f"""
    WITH pts AS (
      SELECT c_custkey AS id,
             {_LAT_SQL} AS lat,
             {_LON_SQL} AS lon
      FROM customer
    ),
    b0 AS (
      SELECT id, lat, lon,
             CAST(FLOOR(lon / {GEO_CELL_DEG}) AS BIGINT) AS jx,
             CAST(FLOOR(lat / {GEO_CELL_DEG}) AS BIGINT) AS jy
      FROM pts
    ),
    occ AS (SELECT jx, jy, COUNT(*) AS o FROM b0 GROUP BY jx, jy),
    b AS (
      SELECT b0.* FROM b0 JOIN occ USING (jx, jy) WHERE occ.o <= {GEO_CELL_CAP}
    ),
    a AS (
      SELECT id, lat, lon, jx + dx.o AS jx, jy + dy.o AS jy
      FROM b0,
           (SELECT unnest([-1, 0, 1]) AS o) dx,
           (SELECT unnest([-1, 0, 1]) AS o) dy
    ),
    cand AS (
      SELECT a.id AS id_a, a.lat AS lat_a, a.lon AS lon_a,
             b.id AS id_b, b.lat AS lat_b, b.lon AS lon_b
      FROM a JOIN b ON a.jx = b.jx AND a.jy = b.jy AND a.id < b.id
    ),
    scored AS (
      SELECT id_a, id_b,
             FLOOR(2 * {EARTH_KM} * asin(sqrt(
               sin((lat_b - lat_a) * pi() / 180 / 2)
                 * sin((lat_b - lat_a) * pi() / 180 / 2)
               + cos(lat_a * pi() / 180) * cos(lat_b * pi() / 180)
                 * sin((lon_b - lon_a) * pi() / 180 / 2)
                 * sin((lon_b - lon_a) * pi() / 180 / 2)
             )) * 1000000 + 0.5) / 1000000 AS dist_km
      FROM cand
    )
    SELECT id_a, id_b, dist_km
    FROM scored
    WHERE dist_km <= 50
    ORDER BY dist_km ASC, id_a ASC, id_b ASC
    LIMIT 20
    """,
)
def geo_proximity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 closest customer pairs within 50 km via the 3x3 grid-cell
    candidate join + exact haversine verification — the spatial
    self-join shape that never goes n²."""
    c = table(spark, sf_dir, "customer")
    cand = grid_neighbor_pairs(
        customer_points(c), "id", "lat", "lon", GEO_CELL_DEG
    )
    dist = haversine_km(
        F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
    )
    q6 = F.floor(dist * 1000000 + F.lit(0.5)) / 1000000
    return (
        cand.select("id_a", "id_b", q6.alias("dist_km"))
        .filter(F.col("dist_km") <= 50)
        .orderBy(F.col("dist_km").asc(), F.col("id_a").asc(), F.col("id_b").asc())
        .limit(20)
    )
