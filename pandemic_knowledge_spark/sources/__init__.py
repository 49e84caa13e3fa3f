"""Ingest frontends (SURVEY.md §2.1 S1–S6): dialect-sniffed CSV, candidate
header resolution, HTTP fetch, bounded crawler adapters, and the conformed
ingest pipelines that mirror the reference's five Prefect flows.
"""

from pandemic_knowledge_spark.sources.csv_sniff import (
    read_csv_sniffed,
    sniff_dialect,
)
from pandemic_knowledge_spark.sources.resolve import (
    MalformedFileError,
    ingest_isolated,
    require_resolvable,
)
from pandemic_knowledge_spark.sources.http_fetch import fetch_to_local
from pandemic_knowledge_spark.sources.crawlers import (
    NEWS_SCHEMA,
    adapt_google_news_result,
    adapt_tweet,
    fake_google_news,
    fake_tweets,
    google_news_fetch,
    news_source,
    snscrape_fetch,
    tweet_source,
)
from pandemic_knowledge_spark.sources.geocode import (
    NominatimGeocoder,
    enrich_dimension_durable,
)
from pandemic_knowledge_spark.sources.lookup import build_location_dim
from pandemic_knowledge_spark.sources.pipelines import (
    OWID_COLUMNS,
    PARSE_INSERT_COLUMNS,
    ingest_owid,
    ingest_weekly_multisource,
)

__all__ = [
    "sniff_dialect",
    "read_csv_sniffed",
    "MalformedFileError",
    "require_resolvable",
    "ingest_isolated",
    "fetch_to_local",
    "NEWS_SCHEMA",
    "news_source",
    "tweet_source",
    "fake_google_news",
    "fake_tweets",
    "adapt_google_news_result",
    "adapt_tweet",
    "google_news_fetch",
    "snscrape_fetch",
    "NominatimGeocoder",
    "enrich_dimension_durable",
    "build_location_dim",
    "OWID_COLUMNS",
    "PARSE_INSERT_COLUMNS",
    "ingest_owid",
    "ingest_weekly_multisource",
]
