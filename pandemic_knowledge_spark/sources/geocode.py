"""J3's external half: a real (injectable-transport) Nominatim-shaped
geocoder client behind the dimension-enrichment loop.

The reference geocodes unknown location names inline per fact row with
geopy's Nominatim and an in-process dict cache
(/root/reference/flow/scripts/insert_owid.py:71-101). Engine form: the
enrichment loop (sources.lookup.enrich_dimension) batches DISTINCT misses
driver-side, this client resolves them against the public Nominatim HTTP API
(or any transport injected for tests/offline), and resolved rows persist
into a parquet dimension store — the reference's cache made durable and
cluster-wide. The client speaks the real Nominatim ``jsonv2`` response
shape and enforces the API's 1-request/second usage policy.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NOMINATIM_URL = "https://nominatim.openstreetmap.org/search"

# Hand alias table for names Nominatim can't resolve as written — the
# reference's extra_locations (insert_owid.py:40-46).
DEFAULT_ALIASES = {"Czechia": "Czech Republic", "Korea, South": "South Korea"}


def _default_request(query: str, user_agent: str, timeout: float) -> list[dict]:
    """Real HTTP transport (stdlib only): GET /search?format=jsonv2. Never
    exercised in the offline sandbox/tests — inject ``request_fn`` there."""
    from urllib.parse import urlencode
    from urllib.request import Request, urlopen

    qs = urlencode(
        {"q": query, "format": "jsonv2", "addressdetails": 1, "limit": 1}
    )
    req = Request(f"{NOMINATIM_URL}?{qs}", headers={"User-Agent": user_agent})
    with urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read().decode("utf-8"))


class NominatimGeocoder:
    """Batched, rate-limited geocoder over the Nominatim ``jsonv2`` shape.

    Plugs directly into ``enrich_dimension(geocode_fn=...)``: calling the
    instance with a list of names returns ``{name: (lat, lon, ISO2)}`` for
    every name it resolves; unresolved names are omitted (the reference
    logs-and-drops them the same way, insert_owid.py:97-101).

    ``request_fn(query) -> list[dict]`` is the transport seam — the real
    HTTP GET by default, a recorded-fixture replay in tests. Rate limiting
    honors Nominatim's 1 req/s policy via ``min_interval_s`` measured on
    ``clock``/paced by ``sleep_fn`` (both injectable so tests assert pacing
    without wall-clock waits).
    """

    def __init__(
        self,
        request_fn: Callable[[str], list[dict]] | None = None,
        user_agent: str = "pandemic-knowledge-spark",
        min_interval_s: float = 1.0,
        timeout_s: float = 10.0,
        aliases: dict[str, str] | None = None,
        clock: Callable[[], float] = time.monotonic,
        sleep_fn: Callable[[float], None] = time.sleep,
    ) -> None:
        self._request = request_fn or (
            lambda q: _default_request(q, user_agent, timeout_s)
        )
        self._min_interval = min_interval_s
        self._aliases = DEFAULT_ALIASES if aliases is None else aliases
        self._clock = clock
        self._sleep = sleep_fn
        self._last_call: float | None = None

    def _throttle(self) -> None:
        if self._last_call is not None:
            wait = self._min_interval - (self._clock() - self._last_call)
            if wait > 0:
                self._sleep(wait)
        self._last_call = self._clock()

    def geocode_one(self, name: str) -> tuple[float, float, str] | None:
        """One name → (lat, lon, ISO2) or None — the reference's
        format_location contract (insert_owid.py:71-101): a hit needs BOTH
        coordinates and an address.country_code; anything less is a miss."""
        query = self._aliases.get(name, name)
        self._throttle()
        try:
            results = self._request(query)
        except Exception:
            return None  # transport error == unresolved, never fatal
        if not results:
            return None
        top = results[0]
        address = top.get("address") or {}
        cc = address.get("country_code")
        if not cc or "lat" not in top or "lon" not in top:
            return None
        try:
            return (float(top["lat"]), float(top["lon"]), str(cc).upper())
        except (TypeError, ValueError):
            return None  # present-but-malformed coordinate == miss, not fatal

    def __call__(self, names: list[str]) -> dict[str, tuple[float, float, str]]:
        out = {}
        for name in names:
            hit = self.geocode_one(name)
            if hit is not None:
                out[name] = hit
        return out


def enrich_dimension_durable(
    spark: SparkSession,
    dim: DataFrame,
    facts: DataFrame,
    geocode_fn: Callable[[list[str]], dict[str, tuple[float, float, str]]],
    store_path: str,
    on: str = "location_name",
) -> DataFrame:
    """The full J3 loop with a DURABLE cache: previously-resolved rows load
    from ``store_path`` (parquet) and join the dimension BEFORE miss
    detection — so a name geocoded in any earlier run never hits the
    external API again (the cluster-wide form of the reference's in-process
    locations_cache) — and newly-resolved rows append to the store.
    Returns the enriched dimension (base ∪ stored ∪ new)."""
    from pandemic_knowledge_spark.sources.lookup import enrich_dimension

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(store_path)
    fs = path.getFileSystem(hconf)
    if fs.exists(path):
        # Deterministic per-name survivor: blind appends mean a replayed or
        # concurrent run can land the same miss twice, and a duplicate key
        # here would FAN OUT every matching fact row downstream. min_by on
        # a stable total order of the payload keeps one row per name
        # identically on any layout.
        stored = spark.read.parquet(store_path)
        payload = [c for c in stored.columns if c != on]
        stored = (
            stored.groupBy(on)
            .agg(
                F.min(F.struct(*[F.col(c) for c in payload])).alias("_p")
            )
            .select(on, *[F.col(f"_p.{c}").alias(c) for c in payload])
        )
        # The BASE dimension is authoritative: only stored names absent from
        # it join in (left_anti). A union+dropDuplicates here would pick a
        # partition-order-dependent survivor, letting a stale store row
        # (e.g. population=null from an earlier geocode) shadow a real
        # dimension row nondeterministically.
        stored_only = stored.join(dim.select(on), on, "left_anti")
        dim = dim.unionByName(stored_only, allowMissingColumns=True)
    before = dim
    enriched = enrich_dimension(spark, dim, facts, geocode_fn, on=on)
    # localCheckpoint: the emptiness probe AND the append would otherwise
    # evaluate the store-scan + dedup + double anti-join plan twice.
    new_rows = enriched.join(
        before.select(on), on=on, how="left_anti"
    ).localCheckpoint(eager=True)
    if new_rows.limit(1).count() > 0:
        new_rows.write.mode("append").parquet(store_path)
    return enriched
