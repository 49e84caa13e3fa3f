"""S2 — HTTP CSV fetch with bounded retries.

The reference downloads source CSVs over HTTP with 3 connect retries and
0.5 backoff (/root/reference/flow/scripts/insert_france.py:179-192). Here:
stdlib urllib on the driver (fetch is inherently a driver/edge concern —
the distributed part is the parse that follows), same retry envelope, then
the local file feeds ``read_csv_sniffed``. ``file://`` URLs are supported
so tests exercise the full path without network access.
"""

from __future__ import annotations

import os
import tempfile
import time
import urllib.error
import urllib.parse
import urllib.request


def fetch_to_local(
    url: str,
    dest_dir: str | None = None,
    retries: int = 3,
    backoff: float = 0.5,
    timeout: float = 30.0,
) -> str:
    """Download ``url`` to a local file, returning its path.

    Retry envelope mirrors insert_france.py:184-188 (Retry(connect=3,
    backoff_factor=0.5)): sleep backoff * 2**attempt between attempts.
    """
    dest_dir = dest_dir or tempfile.mkdtemp(prefix="pk_fetch_")
    os.makedirs(dest_dir, exist_ok=True)
    # name from the URL PATH only: a raw basename would embed query strings
    # (possibly credentials) into the local filename.
    name = os.path.basename(urllib.parse.urlsplit(url).path.rstrip("/")) or "download.csv"
    dest = os.path.join(dest_dir, name)
    last: Exception | None = None
    for attempt in range(retries):
        try:
            with urllib.request.urlopen(url, timeout=timeout) as r, open(dest, "wb") as f:
                f.write(r.read())
            return dest
        except urllib.error.HTTPError as e:
            if 400 <= e.code < 500:
                # non-transient (404/403): surface immediately — the
                # reference's Retry(connect=3) retries connection errors
                # only, not definitive server answers.
                raise
            last = e
        except Exception as e:  # noqa: BLE001 — connection-class errors
            last = e
        if attempt < retries - 1:
            time.sleep(backoff * (2**attempt))
    raise ConnectionError(f"fetch failed after {retries} attempts: {url}") from last
