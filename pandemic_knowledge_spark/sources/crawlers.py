"""S5/S6 — crawler adapters as bounded sources over the conformed news schema.

The reference crawls Google News per (lang × tag) and scrapes tweets with a
1,000-row cap and 1-day lookback (/root/reference/flow/scripts/
crawl_google_news.py:73-105, crawl_tweets.py:58-86), indexing into the
news mapping (/root/reference/flow/scripts/crawl_mapping.py:1-24). The
external libraries (GoogleNews, snscrape) are network-bound and not part of
an analytics engine, so the adapter takes an injectable ``fetch`` callable
returning plain dicts; deterministic fakes stand in for tests/offline runs.
The Spark side — explicit nested schema, cap via ``limit``, window predicate,
URL dedup (fixing the reference's uuid4 duplicate bug, crawl_tweets.py:52)
— is real and is what matters at scale.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterable, Sequence
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Conformed news shape — crawl_mapping.py:1-24 as a nested StructType.
NEWS_SCHEMA = StructType(
    [
        StructField("title", StringType()),
        StructField("description", StringType()),
        StructField("img", StringType()),
        StructField("date", TimestampType()),
        StructField("lang", StringType()),
        StructField(
            "source",
            StructType(
                [
                    StructField("crawler", StringType()),
                    StructField("website", StringType()),
                    StructField("author", StringType()),
                    StructField("url", StringType()),
                    StructField(
                        "tweet", StructType([StructField("id", StringType())])
                    ),
                ]
            ),
        ),
    ]
)

FetchFn = Callable[[str, str], Iterable[dict]]


def _det_ts(seed: str, base: datetime) -> datetime:
    h = int(hashlib.sha256(seed.encode()).hexdigest()[:8], 16)
    return base - timedelta(minutes=h % (24 * 60))


def fake_google_news(lang: str, tag: str) -> list[dict]:
    """Deterministic offline stand-in for the GoogleNews client (S5)."""
    base = datetime(2024, 1, 2)
    out = []
    for i in range(25):
        seed = f"{lang}-{tag}-{i}"
        out.append(
            {
                "title": f"[{lang}] {tag} headline {i}",
                "description": f"story {i} about {tag}",
                "img": f"https://news-{i % 5}.example/img/{i}.jpg",
                "date": _det_ts(seed, base),
                "lang": lang,
                "source": {
                    "crawler": "google_news",
                    "website": f"news-{i % 5}.example",
                    "author": None,
                    # i%20 over 25 items → repeated URLs within one sweep,
                    # like a story resurfacing across result pages.
                    "url": f"https://news-{i % 5}.example/{lang}/{tag.lower()}/{i % 20}",
                    "tweet": None,
                },
            }
        )
    return out


def fake_tweets(lang: str, tag: str) -> list[dict]:
    """Deterministic offline stand-in for the tweet scraper (S6) — includes
    duplicate URLs across calls, like the reference's overlapping re-crawl."""
    base = datetime(2024, 1, 2)
    out = []
    for i in range(1500):  # above the 1,000 cap on purpose
        seed = f"tw-{lang}-{tag}-{i}"
        out.append(
            {
                "title": f"Tweet from user{i % 400}: {tag} #{i % 700}",
                "description": None,
                "img": None,
                "date": _det_ts(seed, base),
                "lang": lang,
                "source": {
                    "crawler": "twitter",
                    "website": "twitter.com",
                    "author": f"user{i % 400}",
                    "url": f"https://twitter.com/user{(i % 700) % 400}/status/{i % 700}",
                    "tweet": {"id": str(i % 700)},
                },
            }
        )
    return out


def _records_df(
    spark: SparkSession, fetch: FetchFn, params: Sequence[tuple[str, str]]
) -> DataFrame:
    rows: list[dict] = []
    for lang, tag in params:  # lang×tag loop, crawl_google_news.py:91-105
        rows.extend(fetch(lang, tag))
    return spark.createDataFrame(rows, schema=NEWS_SCHEMA)


def news_source(
    spark: SparkSession,
    fetch: FetchFn = fake_google_news,
    langs: Sequence[str] = ("fr", "en"),
    tags: Sequence[str] = ("COVID", "CORONA"),
    lookback: str | None = "1 day",
) -> DataFrame:
    """S5 — Google-News-shaped bounded source: lang×tag sweep, 24h window,
    URL-deduped, uuid doc ids (K2)."""
    df = _records_df(spark, fetch, [(l, t) for l in langs for t in tags])
    if lookback is not None:
        # period="24h" (crawl_google_news.py:86-89) relative to the feed max.
        mx = df.agg(F.max("date")).first()[0]
        if mx is not None:
            df = df.filter(F.col("date") >= F.lit(mx) - F.expr(f"INTERVAL {lookback}"))
    return _dedup_by_url(df).withColumn("id", F.expr("uuid()"))


def tweet_source(
    spark: SparkSession,
    fetch: FetchFn = fake_tweets,
    lang: str = "en",
    tag: str = "covid",
    cap: int = 1000,
) -> DataFrame:
    """S6 — tweet-shaped bounded source: single query, hard cap (the
    reference's tweet_limit=1000, crawl_tweets.py:19,66-67), URL-deduped."""
    df = _records_df(spark, fetch, [(lang, tag)])
    return _dedup_by_url(df.limit(cap)).withColumn("id", F.expr("uuid()"))


def _dedup_by_url(df: DataFrame) -> DataFrame:
    # Deterministic keeper per URL: the LATEST story wins (ties by title),
    # not dropDuplicates' partitioning-dependent arbitrary row — a re-crawl
    # that resurfaces an old URL with a fresher timestamp must replace it
    # identically on every cluster layout.
    from pyspark.sql.window import Window

    w = Window.partitionBy("_url").orderBy(
        F.desc_nulls_last("date"), F.desc_nulls_last("title")
    )
    return (
        df.withColumn("_url", F.col("source.url"))
        .withColumn("_rn", F.row_number().over(w))
        # NULL URLs are NOT one dedup key: items lacking a link (some tweet
        # shapes) are distinct stories and must all pass through — only
        # rows that actually share a URL collapse.
        .filter(F.col("_url").isNull() | (F.col("_rn") == 1))
        .drop("_url", "_rn")
    )


# ---------------------------------------------------------------------------
# Real-client adapters (S5/S6 conformance): the exact raw shapes the
# reference's libraries emit, conformed to NEWS_SCHEMA. Offline, recorded
# fixtures in these same shapes (tests/fixtures/) drive the adapters; online,
# pass the real client factories.
# ---------------------------------------------------------------------------


def _parse_dt(v) -> datetime | None:
    """Raw client timestamps → naive UTC datetime: GoogleNews yields naive
    datetimes, snscrape yields tz-aware UTC, fixtures yield ISO strings."""
    if v is None:
        return None
    if isinstance(v, str):
        v = datetime.fromisoformat(v)
    if v.tzinfo is not None:
        v = v.astimezone(timezone.utc).replace(tzinfo=None)
    return v


def adapt_google_news_result(new: dict, lang: str) -> dict | None:
    """One raw GoogleNews `results()` dict → conformed news row — the same
    field mapping as the reference's format_new
    (/root/reference/flow/scripts/crawl_google_news.py:56-70): `desc`→
    description, `site`→source.website, scheme-less `link` gains https://,
    `datetime`→date, crawler tag 'Google News'."""
    if not new or not new.get("title") or not new.get("link"):
        # the real library emits empty/partial dicts on parse misses; a
        # malformed row quarantines (skips), it never aborts the sweep
        return None
    link = new.get("link")
    url = f"https://{link}" if link and "://" not in str(link) else link
    return {
        "title": str(new["title"]),
        "description": str(new.get("desc") or ""),
        "img": str(new["img"]) if new.get("img") else None,
        "date": _parse_dt(new.get("datetime")),
        "lang": lang,
        "source": {
            "crawler": "Google News",
            "website": str(new.get("site")) if new.get("site") else None,
            "author": None,
            "url": url,
            "tweet": None,
        },
    }


def adapt_tweet(tweet, lang: str) -> dict:
    """One raw snscrape Tweet (attribute-shaped, or a dict fixture of the
    same fields) → conformed news row — the reference's field mapping
    (/root/reference/flow/scripts/crawl_tweets.py:71-84): synthesized
    title, content→description, url doubles as link/source.url, tweet id
    kept as text (crawl_mapping.py:19)."""
    get = tweet.get if isinstance(tweet, dict) else lambda k, d=None: getattr(tweet, k, d)
    date = _parse_dt(get("date"))
    username = get("username")
    return {
        "title": f"Tweet from {username} the {date}",
        "description": get("content"),
        "img": None,
        "date": date,
        "lang": lang,
        "source": {
            "crawler": "twitter",
            "website": "https://twitter.com",
            "author": username,
            "url": get("url"),
            "tweet": {"id": str(get("id"))},
        },
    }


def google_news_fetch(client_factory: Callable[[str], object]) -> FetchFn:
    """FetchFn over a GoogleNews-API-shaped client: ``client_factory(lang)``
    must return an object with ``get_news(tag)`` and ``results(sort=True)``
    — the real library's surface (crawl_google_news.py:73-81). Works with
    the real client online or a fixture-replaying fake offline."""

    def fetch(lang: str, tag: str) -> list[dict]:
        client = client_factory(lang)
        client.get_news(tag)
        out = []
        for new in client.results(sort=True) or []:
            row = adapt_google_news_result(new, lang)
            if row:
                out.append(row)
        return out

    return fetch


def snscrape_fetch(
    scraper_factory: Callable[[str], object], limit: int = 1000
) -> FetchFn:
    """FetchFn over a snscrape-shaped scraper: ``scraper_factory(query)``
    must return an object with ``get_items()`` yielding Tweet-shaped items
    (crawl_tweets.py:62-67 builds `"{tag} since:... lang:{lang}"` and
    enumerates with a hard cap)."""

    def fetch(lang: str, tag: str) -> list[dict]:
        items = scraper_factory(f"{tag} lang:{lang}").get_items()
        out = []
        for i, tw in enumerate(items):
            if i >= limit:
                break
            out.append(adapt_tweet(tw, lang))
        return out

    return fetch
