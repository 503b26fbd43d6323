"""Spatial join operators — grid-bucketed proximity search.

The all-pairs distance join is the classic accidental cross product;
the standard engine answer (GeoSpark/Sedona, BigQuery ST_*, the
H3/S2 ecosystems) is GRID BUCKETING: key both sides by a coarse
lat/lon cell, replicate the probe side to its 3×3 cell neighborhood,
and equi-join on the cell — every true neighbor pair within the
radius shares one of the nine cells as long as the cell is at least
as wide as the search radius at the working latitudes.  Distances are
then verified exactly (haversine) on the candidate pairs only, so
the join cost is O(pairs sharing a neighborhood), never |L|·|R|.

No external geo library is involved: cells are integer arithmetic,
haversine is Spark built-ins (radians/sin/cos/asin — all codegen),
and the DuckDB oracle reproduces the same formula exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088  # IUGG mean Earth radius


def haversine_km(lat1, lon1, lat2, lon2):
    """Great-circle distance in km between two (degree) points as a
    Column expression — the standard haversine, numerically stable
    for small angles (asin form)."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dp = F.radians(lat2 - lat1) / 2.0
    dl = F.radians(lon2 - lon1) / 2.0
    a = F.sin(dp) * F.sin(dp) + F.cos(p1) * F.cos(p2) * F.sin(dl) * F.sin(dl)
    return 2.0 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def _lon_cell_count(cell_deg: float) -> int:
    """Number of longitude cells around the globe.  ``cell_deg`` must
    divide 360 evenly so the 3×3 neighborhood can wrap at the
    antimeridian with a plain ``pmod`` — a non-divisor grid has a seam
    cell of a different width where wrapping is ill-defined, which
    would silently drop true neighbor pairs straddling ±180°."""
    n = 360.0 / cell_deg
    n_int = round(n)
    if abs(n - n_int) > 1e-9:
        raise ValueError(
            f"cell_deg {cell_deg} must divide 360 evenly (360/cell_deg = "
            f"{n}) so longitude cells wrap cleanly at the antimeridian"
        )
    return int(n_int)


def nearest_within_radius(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    cell_deg: float,
    left_id: str = "id",
    right_id: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_abs_lat: float = 75.0,
) -> DataFrame:
    """For every left point, the NEAREST right point within
    ``radius_km`` — store-to-warehouse assignment, user-to-POI
    matching, sensor-to-station attachment.

    ``cell_deg`` must cover the radius at the working latitudes:
    ``radius_km ≤ cell_deg · 111.19`` for latitude and ``radius_km ≤
    cell_deg · 111.19 · cos(max_abs_lat)`` for longitude — asserted
    here rather than documented-and-forgotten, because an undersized
    cell silently DROPS true neighbors (the unacceptable failure
    mode).  Points beyond ``max_abs_lat`` are rejected for the same
    reason (longitude cells collapse toward the poles; polar
    workloads need a different tiling).

    Scale shape: ONE equi-join on the cell key (the left side carries
    its cell; the right side replicates ×9 to its neighborhood — the
    smaller/dimension side by convention), exact haversine on the
    candidates, then ``min_by`` per left id inside one hash aggregate
    (never a rank window).  Ties break (distance, right id).  Returns
    ``(left_id, nearest_<right_id>, distance_km)`` with distance
    rounded to 3 decimals (~1 m).
    """
    import math

    lat_span = cell_deg * 111.19
    lon_span = cell_deg * 111.19 * math.cos(math.radians(max_abs_lat))
    if radius_km > min(lat_span, lon_span):
        raise ValueError(
            f"cell_deg {cell_deg} too small for radius {radius_km} km at "
            f"|lat| <= {max_abs_lat} (covers {min(lat_span, lon_span):.1f} km)"
        )
    n_x = _lon_cell_count(cell_deg)

    def cells(df, id_c, replicate: bool):
        # longitude cells wrap modulo the globe so pairs straddling
        # the ±180° antimeridian still meet in a shared cell; latitude
        # never wraps (poles are rejected via max_abs_lat instead)
        out = df.select(
            F.col(id_c),
            F.col(lat_col).cast("double").alias("__lat"),
            F.col(lon_col).cast("double").alias("__lon"),
            F.floor(F.col(lat_col) / cell_deg).alias("__cy"),
            F.pmod(F.floor(F.col(lon_col) / cell_deg), F.lit(n_x)).alias(
                "__cx"
            ),
        )
        bad = F.abs(F.col("__lat")) > max_abs_lat
        out = out.withColumn(
            "__lat",
            F.when(bad, F.raise_error(F.lit("latitude beyond max_abs_lat")))
            .otherwise(F.col("__lat")),
        )
        if not replicate:
            return out.withColumn(
                "__cell",
                F.concat_ws(":", F.col("__cy"), F.col("__cx")),
            )
        off = F.explode(
            F.array(*[F.lit(i) for i in range(9)])
        ).alias("__o")
        out = out.select("*", off)
        return out.select(
            F.col(id_c),
            "__lat",
            "__lon",
            F.concat_ws(
                ":",
                F.col("__cy") + (F.col("__o") % 3 - 1),
                F.pmod(
                    F.col("__cx") + (F.col("__o") / 3).cast("long") - 1,
                    F.lit(n_x),
                ),
            ).alias("__cell"),
        )

    l = cells(left, left_id, replicate=False).withColumnRenamed(
        "__lat", "__llat"
    ).withColumnRenamed("__lon", "__llon")
    r = cells(right, right_id, replicate=True).withColumnRenamed(
        "__lat", "__rlat"
    ).withColumnRenamed("__lon", "__rlon")
    if left_id == right_id:
        r = r.withColumnRenamed(right_id, f"__r_{right_id}")
        right_out = f"__r_{right_id}"
    else:
        right_out = right_id
    dist = F.round(
        haversine_km(
            F.col("__llat"), F.col("__llon"),
            F.col("__rlat"), F.col("__rlon"),
        ),
        3,
    )
    cand = (
        l.join(r, "__cell")
        .withColumn("__d", dist)
        .filter(F.col("__d") <= radius_km)
    )
    pick = F.struct(F.col("__d"), F.col(right_out))
    return (
        cand.groupBy(left_id)
        .agg(F.min(pick).alias("__best"))
        .select(
            left_id,
            F.col(f"__best.{right_out}").alias(f"nearest_{right_id}"),
            F.col("__best.__d").alias("distance_km"),
        )
    )


def pairs_within_radius(
    points: DataFrame,
    radius_km: float,
    cell_deg: float,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_abs_lat: float = 75.0,
) -> DataFrame:
    """All point pairs within ``radius_km`` of each other — the edge
    list of the proximity graph (spatial clustering, coverage
    analysis, contact tracing).  Same grid discipline as
    :func:`nearest_within_radius` (one side carries its cell, the
    other replicates ×9; exact haversine verify on cell-sharing
    candidates only) with the same asserted cell-covers-radius guard.
    Returns ``(id_a, id_b, distance_km)`` with ``id_a < id_b``,
    distance rounded to 3 decimals.
    """
    import math

    lat_span = cell_deg * 111.19
    lon_span = cell_deg * 111.19 * math.cos(math.radians(max_abs_lat))
    if radius_km > min(lat_span, lon_span):
        raise ValueError(
            f"cell_deg {cell_deg} too small for radius {radius_km} km at "
            f"|lat| <= {max_abs_lat} (covers {min(lat_span, lon_span):.1f} km)"
        )
    n_x = _lon_cell_count(cell_deg)
    base = points.select(
        F.col(id_col),
        F.col(lat_col).cast("double").alias("__lat"),
        F.col(lon_col).cast("double").alias("__lon"),
    )
    # longitude cell wraps modulo the globe (antimeridian pairs meet
    # in a shared cell); latitude never wraps
    anchored = base.select(
        F.col(id_col).alias("id_a"),
        F.col("__lat").alias("__alat"),
        F.col("__lon").alias("__alon"),
        F.concat_ws(
            ":",
            F.floor(F.col("__lat") / cell_deg),
            F.pmod(F.floor(F.col("__lon") / cell_deg), F.lit(n_x)),
        ).alias("__cell"),
    )
    off = F.explode(F.array(*[F.lit(i) for i in range(9)])).alias("__o")
    probes = base.select("*", off).select(
        F.col(id_col).alias("id_b"),
        F.col("__lat").alias("__blat"),
        F.col("__lon").alias("__blon"),
        F.concat_ws(
            ":",
            F.floor(F.col("__lat") / cell_deg) + (F.col("__o") % 3 - 1),
            F.pmod(
                F.floor(F.col("__lon") / cell_deg)
                + (F.col("__o") / 3).cast("long") - 1,
                F.lit(n_x),
            ),
        ).alias("__cell"),
    )
    dist = F.round(
        haversine_km(
            F.col("__alat"), F.col("__alon"),
            F.col("__blat"), F.col("__blon"),
        ),
        3,
    )
    # no distinct needed: the anchor side carries exactly ONE cell and
    # the probe side's nine neighborhood cells are pairwise distinct,
    # so each (a, b) pair can meet on at most one cell key
    return (
        anchored.join(probes, "__cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("distance_km", dist)
        .filter(F.col("distance_km") <= radius_km)
        .select("id_a", "id_b", "distance_km")
    )
