"""Geospatial expressions (SURVEY.md §1.1 geo_point, §2.6 A2 geo-bucketed
aggregation — the reference's Kibana world-map panels over ES geo_point,
/root/reference/flow/scripts/mapping.py:12, README.md:26-28).

Spark-first choices:
- geo_point = plain (lat double, lon double) columns / struct — no custom
  type needed (SURVEY.md §7 risk register).
- Map bucketing = equal-angle GRID cells from pure arithmetic. A geohash is
  a base32 z-order encoding of exactly this grid; the arithmetic form keeps
  the whole aggregation inside codegen and is reproducible in any engine
  (the DuckDB oracle runs the same floor arithmetic bit-for-bit), which a
  string geohash UDF would not be.
- Distance = haversine for true km, squared-degree for exact-arithmetic
  ranking (identical order at small extents, zero trig → deterministic
  across libm implementations).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088


def synth_lat(key: Column) -> Column:
    """Deterministic synthetic latitude from an integer key (testdata has no
    coordinate columns; same arithmetic runs in the oracle)."""
    return (key * F.lit(7919) % F.lit(18000)) / F.lit(100.0) - F.lit(90.0)


def synth_lon(key: Column) -> Column:
    return (key * F.lit(104729) % F.lit(36000)) / F.lit(100.0) - F.lit(180.0)


def grid_cell(lat: Column, lon: Column, cell_deg: float = 10.0) -> tuple[Column, Column]:
    """A2 — equal-angle grid bucket (gy, gx) for map aggregation. Pure
    floor arithmetic → codegen'd, oracle-reproducible, and monotone in
    (lat, lon) so cell ranges prune."""
    gy = F.floor(lat / F.lit(cell_deg)).cast("long")
    gx = F.floor(lon / F.lit(cell_deg)).cast("long")
    return gy, gx


def grid_cell_id(lat: Column, lon: Column, cell_deg: float = 10.0) -> Column:
    gy, gx = grid_cell(lat, lon, cell_deg)
    return F.concat_ws(":", gy, gx)


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (float trig — for display/real use;
    oracle-checked queries rank by sq_degree_dist instead)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon / 2) ** 2
    )
    return F.lit(2 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def sq_degree_dist(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Squared equal-angle distance — exact arithmetic (no trig), so the
    deterministic form for top-k-nearest queries that must hash-match an
    oracle. It is a coordinate-space metric, not km: longitude degrees
    shrink by cos(lat), so against haversine the ranking agrees when
    displacements grow monotonically in both axes (nested rings) but can
    differ for elongated point sets; use haversine_km when true great-circle
    order matters and exact cross-engine reproducibility does not."""
    return (lat1 - lat2) * (lat1 - lat2) + (lon1 - lon2) * (lon1 - lon2)


def ring_index(sq_dist: Column, edges_deg) -> Column:
    """ES/Kibana ``geo_distance`` ring bucket: the index of the first ring
    whose outer edge exceeds the point's distance (edges in DEGREES,
    compared as squared degrees — exact arithmetic, no trig, so the bucket
    id hashes identically on any engine; the same determinism trade-off as
    :func:`sq_degree_dist`). Points beyond the last edge land in ring
    len(edges) (the unbounded outer ring)."""
    if not edges_deg:
        # both twins must fail identically — an edgeless ring spec is a
        # caller bug, not "everything in ring 0"
        raise ValueError("ring_index: edges_deg must be non-empty")
    expr = F.lit(len(edges_deg))
    for i in range(len(edges_deg) - 1, -1, -1):
        e = float(edges_deg[i])
        expr = F.when(sq_dist < F.lit(e * e), F.lit(i)).otherwise(expr)
    return expr


def sql_ring_index(sq_dist_expr: str, edges_deg) -> str:
    """DuckDB emitter for :func:`ring_index` — same edge² comparisons."""
    if not edges_deg:
        raise ValueError("sql_ring_index: edges_deg must be non-empty")
    cases = " ".join(
        f"WHEN ({sq_dist_expr}) < {float(e) * float(e)} THEN {i}"
        for i, e in enumerate(edges_deg)
    )
    return f"CASE {cases} ELSE {len(edges_deg)} END"


# Oracle SQL fragments (DuckDB) — the IDENTICAL arithmetic as above.

def sql_synth_lat(key: str) -> str:
    return f"({key} * 7919 % 18000) / 100.0 - 90.0"


def sql_synth_lon(key: str) -> str:
    return f"({key} * 104729 % 36000) / 100.0 - 180.0"


def sql_grid(expr: str, cell_deg: float = 10.0) -> str:
    return f"CAST(floor(({expr}) / {cell_deg}) AS BIGINT)"


def synth_lat_micro(key: Column) -> Column:
    """The synthetic latitude in exact integer HUNDREDTHS-of-a-degree
    (before the /100 − 90 shift of :func:`synth_lat`): centroid averages
    sum these int64s — partitioning-invariant, so Spark and the oracle
    hash identically — and convert to degrees once, after the divide."""
    return (key * F.lit(7919) % F.lit(18000)).cast("long")


def synth_lon_micro(key: Column) -> Column:
    return (key * F.lit(104729) % F.lit(36000)).cast("long")


def sql_synth_lat_micro(key: str) -> str:
    return f"CAST({key} * 7919 % 18000 AS BIGINT)"


def sql_synth_lon_micro(key: str) -> str:
    return f"CAST({key} * 104729 % 36000 AS BIGINT)"


#: Web-Mercator latitude clamp (the standard geotile bound: beyond it the
#: projection diverges; ES clamps identically).
MERCATOR_MAX_LAT = 85.05112877980659


def geotile_cell(lat: Column, lon: Column, zoom: int) -> tuple[Column, Column]:
    """ES/Kibana ``geotile_grid`` bucket key: the Web-Mercator z/x/y map
    tile (the slippy-map scheme every tile server uses — unlike the
    equal-angle :func:`grid_cell`, tiles are equal-AREA on the projected
    map, which is what the Kibana map actually draws). Latitude clamps to
    ±85.0511° exactly as ES does.

    Cross-engine determinism note: the y tile needs ln/tan, whose last
    ulp may differ between runtimes; the projected coordinate is rounded
    to 9 decimals BEFORE the floor so both engines land on the same tile
    unless the true value sits within 5e-10 of a tile boundary — the SQL
    twin applies the identical rounding."""
    n = float(1 << zoom)
    lat_c = F.greatest(
        F.least(lat, F.lit(MERCATOR_MAX_LAT)), F.lit(-MERCATOR_MAX_LAT)
    )
    xt = F.floor(F.round((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n), 9))
    lat_r = F.radians(lat_c)
    merc = (
        F.lit(1.0)
        - F.log(F.tan(lat_r) + F.lit(1.0) / F.cos(lat_r)) / F.lit(3.141592653589793)
    ) / F.lit(2.0)
    yt = F.floor(F.round(merc * F.lit(n), 9))
    # lon=180 exactly maps past the last tile; clamp into range like ES
    max_t = F.lit(int(n) - 1)
    return (
        F.least(F.greatest(xt, F.lit(0)), max_t).cast("long"),
        F.least(F.greatest(yt, F.lit(0)), max_t).cast("long"),
    )


def sql_geotile_cell(lat: str, lon: str, zoom: int) -> tuple[str, str]:
    """DuckDB twin of :func:`geotile_cell` — identical clamp, identical
    9-dp pre-floor rounding."""
    n = float(1 << zoom)
    max_t = int(n) - 1
    lat_c = f"greatest(least({lat}, {MERCATOR_MAX_LAT!r}), {-MERCATOR_MAX_LAT!r})"
    xt = f"floor(round((({lon}) + 180.0) / 360.0 * {n!r}, 9))"
    merc = (
        f"(1.0 - ln(tan(radians({lat_c})) + 1.0 / cos(radians({lat_c})))"
        f" / 3.141592653589793) / 2.0"
    )
    yt = f"floor(round(({merc}) * {n!r}, 9))"
    clamp = lambda e: f"CAST(least(greatest({e}, 0), {max_t}) AS BIGINT)"
    return clamp(xt), clamp(yt)


#: Standard geohash base-32 alphabet (no a/i/l/o).
GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_bits(precision: int) -> tuple[int, int, int]:
    bits = precision * 5
    return bits, (bits + 1) // 2, bits // 2  # total, lon bits, lat bits


def geohash_cell(lat: Column, lon: Column, precision: int = 5) -> Column:
    """ES/Kibana ``geohash_grid`` bucket key: the base-32 geohash cell of
    (lat, lon) at ``precision`` chars — the OTHER Kibana map gridding
    next to :func:`geotile_cell` (geohash cells are lat/lon-rectangular;
    geotiles are Web-Mercator squares).

    Pure integer construction so both engines agree bit-for-bit:
    quantize each axis to its bit budget (longitude owns the extra bit —
    the standard even-bit convention), with the 9-dp pre-floor rounding
    that keeps an ulp in the degree arithmetic from crossing a cell
    boundary (same idiom as geotile), then interleave bits lon-first and
    emit 5-bit base-32 chars. Whole-stage codegen — shifts, masks and a
    literal char array, no UDF."""
    bits, lon_bits, lat_bits = _geohash_bits(precision)
    lon_q = F.greatest(
        F.least(
            F.floor(F.round((lon + F.lit(180.0)) / F.lit(360.0) * (1 << lon_bits), 9)),
            F.lit((1 << lon_bits) - 1),
        ),
        F.lit(0),
    ).cast("long")
    lat_q = F.greatest(
        F.least(
            F.floor(F.round((lat + F.lit(90.0)) / F.lit(180.0) * (1 << lat_bits), 9)),
            F.lit((1 << lat_bits) - 1),
        ),
        F.lit(0),
    ).cast("long")
    total = F.lit(0).cast("long")
    for i in range(lon_bits):  # lon takes positions 0, 2, 4, … from the MSB
        bit = F.shiftright(lon_q, lon_bits - 1 - i).bitwiseAND(F.lit(1))
        total = total + F.shiftleft(bit.cast("long"), bits - 1 - 2 * i)
    for i in range(lat_bits):  # lat takes positions 1, 3, 5, …
        bit = F.shiftright(lat_q, lat_bits - 1 - i).bitwiseAND(F.lit(1))
        total = total + F.shiftleft(bit.cast("long"), bits - 2 - 2 * i)
    alphabet = F.array(*[F.lit(c) for c in GEOHASH32])
    chars = [
        F.element_at(
            alphabet,
            (
                F.shiftright(total, bits - 5 * (c + 1)).bitwiseAND(F.lit(31))
                + 1
            ).cast("int"),
        )
        for c in range(precision)
    ]
    return F.concat(*chars)


def sql_geohash_quant(lat_sql: str, lon_sql: str, precision: int) -> tuple[str, str]:
    """The two integer quantizer fragments (lon_q, lat_q) mirroring
    :func:`geohash_cell` — compute these once in a CTE, then feed the
    column names to :func:`sql_geohash_chars`."""
    bits, lon_bits, lat_bits = _geohash_bits(precision)
    lon_q = (
        f"greatest(least(CAST(floor(round((({lon_sql}) + 180.0) / 360.0"
        f" * {1 << lon_bits}, 9)) AS BIGINT), {(1 << lon_bits) - 1}), 0)"
    )
    lat_q = (
        f"greatest(least(CAST(floor(round((({lat_sql}) + 90.0) / 180.0"
        f" * {1 << lat_bits}, 9)) AS BIGINT), {(1 << lat_bits) - 1}), 0)"
    )
    return lon_q, lat_q


def sql_geohash_chars(lonq_col: str, latq_col: str, precision: int) -> str:
    """The base-32 cell id from already-quantized integer columns —
    identical interleave/char math to :func:`geohash_cell`."""
    bits, lon_bits, lat_bits = _geohash_bits(precision)
    terms = []
    for i in range(lon_bits):
        terms.append(
            f"((({lonq_col} >> {lon_bits - 1 - i}) & 1) << {bits - 1 - 2 * i})"
        )
    for i in range(lat_bits):
        terms.append(
            f"((({latq_col} >> {lat_bits - 1 - i}) & 1) << {bits - 2 - 2 * i})"
        )
    total = "(" + " + ".join(terms) + ")"
    chars = [
        f"substr('{GEOHASH32}', CAST((({total} >> {bits - 5 * (c + 1)}) & 31)"
        f" + 1 AS INTEGER), 1)"
        for c in range(precision)
    ]
    return "(" + " || ".join(chars) + ")"
