"""NominatimGeocoder + durable enrichment loop (J3's external half).

The transport is a recorded fixture in the real Nominatim jsonv2 shape
(tests/fixtures/nominatim_responses.json); clock/sleep are simulated so
rate-limit pacing is asserted without wall-clock waits.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from pandemic_knowledge_spark.sources.geocode import (
    NominatimGeocoder,
    enrich_dimension_durable,
)

_FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "nominatim_responses.json"
)


def _load_fixture():
    with open(_FIXTURE) as f:
        return json.load(f)


class _FakeClock:
    def __init__(self):
        self.t = 0.0
        self.sleeps = []

    def __call__(self):
        return self.t

    def sleep(self, s):
        self.sleeps.append(s)
        self.t += s


def _fixture_geocoder(recorded_queries=None, min_interval=1.0):
    fx = _load_fixture()
    clock = _FakeClock()

    def request(query):
        if recorded_queries is not None:
            recorded_queries.append(query)
        clock.t += 0.05  # transport latency
        return fx.get(query, [])

    return (
        NominatimGeocoder(
            request_fn=request,
            min_interval_s=min_interval,
            clock=clock,
            sleep_fn=clock.sleep,
        ),
        clock,
    )


def test_geocode_contract_matches_reference():
    """Hit needs coordinates AND address.country_code (insert_owid.py:83-95);
    empty results and code-less results are misses; aliases rewrite the
    query (extra_locations)."""
    queries = []
    geo, _ = _fixture_geocoder(queries)
    out = geo(["Utopiaville", "Atlantis", "Nowhere Land", "Czechia"])
    assert out["Utopiaville"] == (48.8588897, 2.320041, "FR")
    assert "Atlantis" not in out  # no results
    assert "Nowhere Land" not in out  # results but no country_code
    assert out["Czechia"] == (49.7439047, 15.3381061, "CZ")  # via alias
    assert "Czech Republic" in queries and "Czechia" not in queries


def test_rate_limit_pacing():
    """Consecutive requests are spaced >= min_interval on the injected
    clock — Nominatim's 1 req/s usage policy."""
    geo, clock = _fixture_geocoder(min_interval=1.0)
    geo(["Utopiaville", "Atlantis", "Czechia"])
    # first call free, following calls each sleep ~0.95s (1.0 - 0.05 latency)
    assert len(clock.sleeps) == 2
    assert all(0.9 <= s <= 1.0 for s in clock.sleeps)


def test_transport_error_is_unresolved_not_fatal():
    def broken(query):
        raise OSError("network down")

    geo = NominatimGeocoder(request_fn=broken, sleep_fn=lambda s: None)
    assert geo(["Utopiaville"]) == {}


def test_enrich_dimension_durable_caches_across_runs(spark, tmp_path):
    """Run 1 geocodes the misses and persists them; run 2 must resolve the
    same names from the parquet store WITHOUT touching the transport."""
    dim = spark.createDataFrame(
        [("Paris", {"lat": 48.86, "lon": 2.35}, "FR", 1000)],
        "location_name string, geo struct<lat:double,lon:double>, iso_code2 string, population long",
    )
    facts = spark.createDataFrame(
        [("Paris",), ("Utopiaville",), ("Atlantis",)], "location_name string"
    )
    store = str(tmp_path / "geo_store")

    queries1 = []
    geo1, _ = _fixture_geocoder(queries1)
    enriched = enrich_dimension_durable(spark, dim, facts, geo1, store)
    got = {r.location_name: r for r in enriched.collect()}
    assert set(got) == {"Paris", "Utopiaville"}  # Atlantis unresolved
    assert got["Utopiaville"].iso_code2 == "FR"
    assert abs(got["Utopiaville"].geo.lat - 48.8588897) < 1e-9
    assert "Utopiaville" in queries1

    # run 2: same misses, transport must only be asked for the still-missing name
    queries2 = []
    geo2, _ = _fixture_geocoder(queries2)
    enriched2 = enrich_dimension_durable(spark, dim, facts, geo2, store)
    assert {r.location_name for r in enriched2.collect()} == {"Paris", "Utopiaville"}
    assert queries2 == ["Atlantis"]  # Utopiaville served from the store


def test_base_dimension_shadows_stale_store_rows(spark, tmp_path):
    """A name later added to the authoritative base dim must win over the
    earlier geocoded store row — deterministically."""
    dim_v1 = spark.createDataFrame(
        [("Paris", {"lat": 48.86, "lon": 2.35}, "FR", 1000)],
        "location_name string, geo struct<lat:double,lon:double>, iso_code2 string, population long",
    )
    facts = spark.createDataFrame([("Utopiaville",)], "location_name string")
    store = str(tmp_path / "store")
    geo, _ = _fixture_geocoder()
    enrich_dimension_durable(spark, dim_v1, facts, geo, store)

    # next run: the curated dim now carries Utopiaville with a population
    dim_v2 = dim_v1.union(
        spark.createDataFrame(
            [("Utopiaville", {"lat": 48.8588897, "lon": 2.320041}, "FR", 777)],
            dim_v1.schema,
        )
    )
    out = enrich_dimension_durable(spark, dim_v2, facts, lambda names: {}, store)
    rows = {r.location_name: r for r in out.collect()}
    assert rows["Utopiaville"].population == 777  # base dim row won
    assert out.filter(F.col("location_name") == "Utopiaville").count() == 1


def test_durable_store_duplicate_appends_collapse(spark, tmp_path):
    """A replayed run's duplicate store rows must not fan facts out: the
    store dedups per name deterministically on load."""
    import pandemic_knowledge_spark.sources.geocode as gc

    store = str(tmp_path / "store")
    rows = [("Atlantis", 1.0), ("Atlantis", 1.0), ("Mu", 2.0)]
    spark.createDataFrame(rows, "location_name string, lat double").write.parquet(store)

    dim = spark.createDataFrame([("Paris", 9.9)], "location_name string, lat double")
    facts = spark.createDataFrame(
        [("Atlantis",), ("Paris",), ("Mu",)], "location_name string"
    )
    enriched = gc.enrich_dimension_durable(
        spark, dim, facts, lambda names: {}, store
    )
    names = [r.location_name for r in enriched.collect()]
    assert sorted(names) == ["Atlantis", "Mu", "Paris"]  # no duplicate keys
