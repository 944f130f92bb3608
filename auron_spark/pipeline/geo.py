"""Geospatial-lite operators: grid-bucketed spatial joins and spatial
aggregation over hash-derived coordinates.

The fixtures carry no latitude/longitude, so every query derives
DETERMINISTIC synthetic coordinates from entity keys via the md5-uniform
pattern `eval_ab_srm_check` proved driver-exact (`conv(substr(md5(k),..),
16, 10)` == DuckDB `'0x' || substr(md5(k),..)`), then runs real spatial
math — haversine great-circle distance, lat/lon grid cells — that is the
SAME double expression tree in both engines (trig at 6-dp round measured
bit-identical cross-engine on the full customer table before this module
was written).

Synthetic-coordinate envelope (documented contract, not incidental):
latitudes land in [-59, 59) and longitudes in [-170, 170), so the grid
join below needs no pole caps and no antimeridian wraparound — the two
places where fixed-degree grids stop being lossless.

Scale notes: the grid join is the standard lossless radius-join pruning
(cell size >= worst-case degree extent of the radius => 3x3 neighbor
cells cover every candidate); the SMALL side is replicated x9, the big
side stays map-side single-cell, and the verify filter runs only on
cell-colocated pairs.  The unpruned quadratic plan exists only in the
DuckDB oracle, so any pruning loss fails the driver hash.

Reference parity: the reference engine has no spatial surface; this
module is part of the beyond-reference training-data-pipeline tier
(geo enrichment/bucketing is a standard curation step for location-tagged
corpora).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from auron_spark.exprs import SQL_DISC_PRICE as _SQL_DISC_PRICE
from auron_spark.exprs import disc_price
from auron_spark.registry import query
from auron_spark.tables import Tables

# Radius-join parameters.  R_KM = 150 km; on a 6371-km sphere a 150-km
# great circle spans <= 150/111.195 = 1.349 deg of latitude, and (with
# every path point below |lat| 59 + 1.35 < 60.4 deg, cos >= 0.494)
# <= 150/(111.195*0.494) = 2.73 deg of longitude — so CELL_LAT = 1.5 and
# CELL_LON = 3.0 make the 3x3 neighborhood provably lossless.
R_KM = 150.0
CELL_LAT = 1.5
CELL_LON = 3.0
_EARTH_2R = 2.0 * 6371.0


def _sql_h(key: str, start: int) -> str:
    """DuckDB: 8 hex chars of md5(key) starting at 1-based `start`, as BIGINT."""
    return (
        f"CAST(('0x' || substr(md5(CAST({key} AS VARCHAR)), {start}, 8)) AS BIGINT)"
    )


def _spark_h(key: str, start: int) -> F.Column:
    return (
        F.conv(F.substring(F.md5(F.col(key).cast("string")), start, 8), 16, 10)
        .cast("long")
    )


def _sql_latlon(key: str) -> tuple[str, str]:
    """Deterministic lat in [-59, 59), lon in [-170, 170) from md5(key)."""
    lat = f"CAST({_sql_h(key, 1)} % 1180000 AS DOUBLE) / 10000 - 59"
    lon = f"CAST({_sql_h(key, 9)} % 3400000 AS DOUBLE) / 10000 - 170"
    return lat, lon


def _spark_latlon(key: str) -> tuple[F.Column, F.Column]:
    lat = (_spark_h(key, 1) % 1180000).cast("double") / 10000 - 59
    lon = (_spark_h(key, 9) % 3400000).cast("double") / 10000 - 170
    return lat, lon


def _sql_haversine(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    return f"""{_EARTH_2R} * asin(sqrt(
        pow(sin(radians(({lat2}) - ({lat1})) / 2), 2)
        + cos(radians({lat1})) * cos(radians({lat2}))
          * pow(sin(radians(({lon2}) - ({lon1})) / 2), 2)))"""


def _spark_haversine(
    lat1: F.Column, lon1: F.Column, lat2: F.Column, lon2: F.Column
) -> F.Column:
    return _EARTH_2R * F.asin(
        F.sqrt(
            F.pow(F.sin(F.radians(lat2 - lat1) / 2), 2)
            + F.cos(F.radians(lat1))
            * F.cos(F.radians(lat2))
            * F.pow(F.sin(F.radians(lon2 - lon1) / 2), 2)
        )
    )


@query(
    "geo_grid_cell_stats",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey, c_mktsegment,
               CAST(c_acctbal AS DECIMAL(12,2)) AS bal,
               {_sql_latlon("c_custkey")[0]} AS lat,
               {_sql_latlon("c_custkey")[1]} AS lon
        FROM customer
    )
    SELECT CAST(floor(lon / 12.0) AS BIGINT) AS cell_x,
           CAST(floor(lat / 6.0) AS BIGINT) AS cell_y,
           COUNT(*) AS n_points,
           CAST(SUM(bal) AS DOUBLE) AS sum_bal,
           CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_segments
    FROM pts
    GROUP BY 1, 2
    HAVING COUNT(*) >= 3
    ORDER BY n_points DESC, cell_x, cell_y
    LIMIT 40
    """,
    tags=("pipeline", "geo", "aggregate"),
)
def geo_grid_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial density aggregation: customers hashed to synthetic
    coordinates, bucketed into fixed 12x6-degree macro cells (coarser
    than the radius join's pruning grid so every fixture SF yields
    populated cells), densest cells
    reported with exact-decimal balance totals — the binning step behind
    heatmaps and behind the radius join's pruning grid.

    Scale shape: cell ids are map-side arithmetic (no UDF, no geometry
    lib), so the whole query is one scan + one hash aggregate at cell
    grain + a TakeOrdered(40); nothing shuffles more than cell partials.
    """
    t = Tables(spark, sf_dir)
    lat, lon = _spark_latlon("c_custkey")
    return (
        t.customer.select(
            F.floor(lon / 12.0).cast("long").alias("cell_x"),
            F.floor(lat / 6.0).cast("long").alias("cell_y"),
            F.col("c_acctbal").cast("decimal(12,2)").alias("bal"),
            "c_mktsegment",
        )
        .groupBy("cell_x", "cell_y")
        .agg(
            F.count("*").alias("n_points"),
            F.sum("bal").cast("double").alias("sum_bal"),
            F.count_distinct("c_mktsegment").cast("long").alias("n_segments"),
        )
        .where(F.col("n_points") >= 3)
        .orderBy(F.desc("n_points"), "cell_x", "cell_y")
        .limit(40)
    )


_CUST_LAT, _CUST_LON = _sql_latlon("c_custkey")
_SUPP_LAT, _SUPP_LON = _sql_latlon("s_suppkey")


@query(
    "geo_radius_join",
    oracle=f"""
    WITH c AS (
        SELECT c_custkey, {_CUST_LAT} AS lat, {_CUST_LON} AS lon FROM customer
    ), s AS (
        SELECT s_suppkey, {_SUPP_LAT} AS lat, {_SUPP_LON} AS lon FROM supplier
    ), pairs AS (
        SELECT c.c_custkey, s.s_suppkey,
               ROUND({_sql_haversine("c.lat", "c.lon", "s.lat", "s.lon")}, 6)
                   AS km
        FROM c, s
        WHERE {_sql_haversine("c.lat", "c.lon", "s.lat", "s.lon")} <= {R_KM}
    )
    SELECT c_custkey,
           COUNT(*) AS n_near,
           MIN(km) AS min_km,
           MIN(CAST(floor(km * 1000000) AS BIGINT) * 1000000 + s_suppkey) % 1000000
               AS nearest_suppkey
    FROM pairs
    GROUP BY c_custkey
    ORDER BY c_custkey
    """,
    tags=("pipeline", "geo", "join"),
    bench=True,
)
def geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius join: every (customer, supplier) pair within 150 km, reduced
    per customer to neighbor count / distance to nearest / nearest
    supplier id — the spatial enrichment step (nearest-facility,
    geo-context tagging) done as a LOSSLESS grid-pruned equi-join.

    The supplier side (the small one) is exploded onto its cell plus the
    8 neighbors; customers carry their single home cell; the equi-join on
    (cell_x, cell_y) reaches every pair whose haversine distance can be
    <= 150 km (cell sizes sized to the worst-case degree extent — see
    module docstring), and the exact haversine filter then runs only on
    cell-colocated candidates.  The DuckDB oracle is the UNPRUNED
    quadratic join, so a single pair lost to pruning fails the hash.

    Scale shape: replication factor is a constant 9 on the small side;
    the join is an equi-join (hash or broadcast, never nested-loop — plan
    gate pins CartesianProduct/BroadcastNestedLoop out); per-pair work is
    map-side trig.  At 100 TB the same shape holds with the dim side
    broadcast or bucketed by cell.
    """
    return grid_radius_join(Tables(spark, sf_dir), R_KM, CELL_LAT, CELL_LON)


def grid_radius_join(
    t: Tables, r_km: float, cell_lat: float, cell_lon: float
) -> DataFrame:
    """Parameterized grid-pruned radius join (see `geo_radius_join`).
    Lossless whenever cell_lat >= r_km/110.57 deg and cell_lon >=
    r_km/(111.195*cos(max|lat| + cell_lat)) deg — property-tested against
    the unpruned cross join at several radii."""
    clat, clon = _spark_latlon("c_custkey")
    slat, slon = _spark_latlon("s_suppkey")
    cust = t.customer.select(
        "c_custkey",
        clat.alias("lat"),
        clon.alias("lon"),
        F.floor(clon / cell_lon).cast("long").alias("cell_x"),
        F.floor(clat / cell_lat).cast("long").alias("cell_y"),
    )
    off = F.explode(F.array(*[F.lit(d) for d in (-1, 0, 1)]))
    supp = (
        t.supplier.select(
            "s_suppkey",
            slat.alias("s_lat"),
            slon.alias("s_lon"),
            F.floor(slon / cell_lon).cast("long").alias("scx"),
            F.floor(slat / cell_lat).cast("long").alias("scy"),
        )
        .withColumn("dx", off)
        .withColumn("dy", off)
        .select(
            "s_suppkey",
            "s_lat",
            "s_lon",
            (F.col("scx") + F.col("dx")).alias("cell_x"),
            (F.col("scy") + F.col("dy")).alias("cell_y"),
        )
    )
    km_raw = _spark_haversine(
        F.col("lat"), F.col("lon"), F.col("s_lat"), F.col("s_lon")
    )
    pairs = (
        cust.join(supp, ["cell_x", "cell_y"])
        .where(km_raw <= r_km)
        .select("c_custkey", "s_suppkey", F.round(km_raw, 6).alias("km"))
    )
    # Nearest-with-tiebreak as a plain MIN over an encoded BIGINT
    # (micro-km * 1e6 + suppkey): identical semantics in both engines
    # without struct-ordered min_by, which DuckDB lacks.  Valid while
    # suppkey < 1e6 (sf100 is 1e6 suppliers — re-widen the encoding then).
    enc = F.floor(F.col("km") * 1000000) * 1000000 + F.col("s_suppkey")
    return (
        pairs.groupBy("c_custkey")
        .agg(
            F.count("*").alias("n_near"),
            F.min("km").alias("min_km"),
            (F.min(enc) % 1000000).alias("nearest_suppkey"),
        )
        .orderBy("c_custkey")
    )


_NLAT, _NLON = _sql_latlon("n_name")


@query(
    "geo_nation_trade_distance",
    oracle=f"""
    WITH centroids AS (
        SELECT n_nationkey, n_name, {_NLAT} AS lat, {_NLON} AS lon FROM nation
    ), flows AS (
        SELECT cn.n_name AS cust_nation,
               ROUND({_sql_haversine("cn.lat", "cn.lon", "sn.lat", "sn.lon")},
                     6) AS km,
               CAST(({_SQL_DISC_PRICE}) * 10000 AS BIGINT) AS rev4
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN centroids cn ON c_nationkey = cn.n_nationkey
        JOIN centroids sn ON s_nationkey = sn.n_nationkey
    )
    SELECT cust_nation,
           COUNT(*) AS n_lines,
           ROUND(CAST(SUM(CAST(rev4 AS DECIMAL(38,0))) AS DOUBLE) / 10000, 2)
               AS revenue,
           ROUND(CAST(SUM(CAST(rev4 AS DECIMAL(38,0))
                          * CAST(floor(km * 1000000) AS BIGINT)) AS DOUBLE)
                 / CAST(SUM(CAST(rev4 AS DECIMAL(38,0))) AS DOUBLE)
                 / 1000000, 4)
               AS wavg_km
    FROM flows
    GROUP BY cust_nation
    ORDER BY cust_nation
    """,
    tags=("pipeline", "geo", "join", "aggregate"),
)
def geo_nation_trade_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-weighted average shipping distance per customer nation:
    hash-derived nation centroids, haversine between customer and
    supplier nations, weights = exact discounted revenue — the logistics
    rollup (avg haul length) a supply-chain mart computes.

    Exactness: discounted revenue is the house-exact DECIMAL(23,4)
    (`exprs.disc_price`), scaled to integer ten-thousandths; the distance
    weight enters as integer micro-km (ROUND(km,6) * 1e6 — exact, km is
    already 6-dp), so the weighted sum is an exact DECIMAL(38,0) integer
    sum in both engines and division happens once, at nation grain.

    Scale shape: the two centroid joins and supplier are broadcast dims;
    the only corpus-sized shuffle is orders |x| lineitem on the order
    key; the final aggregate is 25 rows.
    """
    t = Tables(spark, sf_dir)
    nlat, nlon = _spark_latlon("n_name")
    centroids = t.nation.select(
        "n_nationkey", "n_name", nlat.alias("lat"), nlon.alias("lon")
    )
    cn = centroids.select(
        F.col("n_nationkey").alias("c_nk"),
        F.col("n_name").alias("cust_nation"),
        F.col("lat").alias("c_lat"),
        F.col("lon").alias("c_lon"),
    )
    sn = centroids.select(
        F.col("n_nationkey").alias("s_nk"),
        F.col("lat").alias("s_lat"),
        F.col("lon").alias("s_lon"),
    )
    km = F.round(
        _spark_haversine(
            F.col("c_lat"), F.col("c_lon"), F.col("s_lat"), F.col("s_lon")
        ),
        6,
    )
    rev4 = (disc_price() * 10000).cast("long")
    flows = (
        t.lineitem.join(
            t.orders, F.col("l_orderkey") == F.col("o_orderkey")
        )
        .join(
            F.broadcast(t.customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .select(
            "cust_nation",
            km.alias("km"),
            rev4.alias("rev4"),
        )
    )
    rev_dec = F.col("rev4").cast("decimal(38,0)")
    return (
        flows.groupBy("cust_nation")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum(rev_dec).cast("double") / 10000, 2).alias("revenue"),
            F.round(
                F.sum(rev_dec * F.floor(F.col("km") * 1000000))
                .cast("double")
                / F.sum(rev_dec).cast("double")
                / 1000000,
                4,
            ).alias("wavg_km"),
        )
        .orderBy("cust_nation")
    )
