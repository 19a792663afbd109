"""W7: NOAA CDO materializer (reference
lib_materialize/datamart_materialize/noaa.py:14-87).

The reference pulls ``/data`` pages from the NOAA CDO v2 API (token
header, limit-1000 pages accumulated by offset, 10 retries with 2 s
backoff) and writes a two-column CSV — ``date`` plus the requested
datatype — with ONE ROW PER DATE, the value averaged across all
reporting stations, enforcing a byte size limit.

Everything except the HTTP transport is real and tested here: the
pagination/retry loop accepts an injectable ``fetch`` callable (the
tests drive it with canned pages; production passes nothing and gets
the stdlib-urllib transport, which surfaces the sandbox's lack of
network as a clean ``MaterializeError`` — the same discipline as
S3/S4 in materialize.py).  The date-average rollup is a pure function.
"""

from __future__ import annotations

import csv
import json
import os
import time
import urllib.error
import urllib.parse
import urllib.request

from .materialize import DatasetTooBig, MaterializeError

API_BASE = "https://www.ncdc.noaa.gov/cdo-web/api/v2"
DELAY = 0.5  # reference NoaaMaterializer.DELAY


class UnconfiguredMaterializer(MaterializeError):
    pass


def _default_fetch(url: str, headers: dict, params: dict):
    qs = urllib.parse.urlencode(params)
    req = urllib.request.Request(url + "?" + qs, headers=headers)
    try:
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read().decode("utf-8"))
    except urllib.error.URLError as e:
        raise MaterializeError(f"NOAA API request failed: {e}") from e


def get_all(endpoint: str, token: str, fetch=None, delay: float = DELAY,
            max_failures: int = 10, **params) -> list[dict]:
    """Paginated NOAA fetch (reference noaa.py:14-50): accumulate
    limit-1000 pages by offset until metadata.resultset.count is
    reached; a failing request retries up to ``max_failures`` times
    with a 2 s backoff; an empty body means no data."""
    fetch = fetch or _default_fetch
    headers = {"token": token, "Accept": "application/json"}
    results: list[dict] = []
    failed = 0
    while True:
        try:
            obj = fetch(
                API_BASE + endpoint, headers,
                dict(params, limit="1000", offset=len(results)),
            )
        except MaterializeError:
            failed += 1
            if failed == max_failures:
                raise
            time.sleep(2)
            continue
        if delay:
            time.sleep(delay)
        failed = 0
        if not obj:
            return results
        page = obj.get("results") or []
        if not page:
            # a page that adds nothing while count claims more would
            # loop forever (the count can drift) — treat as exhausted
            return results
        results.extend(page)
        count = int(obj["metadata"]["resultset"]["count"])
        if len(results) >= count:
            break
    return results


def rollup_by_date(rows: list[dict]) -> list[tuple[str, float]]:
    """The W7 aggregation (reference noaa.py:76-87): sort by date, one
    output row per date with the mean of all stations' values —
    streaming groupby semantics, identical ordering and arithmetic."""
    out: list[tuple[str, float]] = []
    cur_date = None
    values: list[float] = []
    for row in sorted(rows, key=lambda v: v["date"]):
        if row["date"] != cur_date:
            if cur_date is not None:
                out.append((cur_date, sum(values) / len(values)))
            cur_date = row["date"]
            values = []
        values.append(row["value"])
    if cur_date is not None:
        out.append((cur_date, sum(values) / len(values)))
    return out


def noaa_download(materialize: dict, dest: str,
                  size_limit: int | None = None, fetch=None,
                  delay: float = DELAY) -> None:
    """Reference NoaaMaterializer.download: $NOAA_TOKEN required,
    /data pulled for the requested dataset/datatype/location/range,
    CSV = header [date, <datatype>] + per-date averages, with the
    running byte limit enforced between rows."""
    token = os.environ.get("NOAA_TOKEN")
    if not token:
        raise UnconfiguredMaterializer("$NOAA_TOKEN is not set")
    data = get_all(
        "/data", token, fetch=fetch, delay=delay,
        datasetid=materialize["noaa_dataset_id"],
        datatypeid=materialize["noaa_datatype_id"],
        locationid=materialize["noaa_city_id"],
        startdate=materialize["noaa_start"],
        enddate=materialize["noaa_end"],
    )
    with open(dest, "w", newline="") as fp:
        wr = csv.writer(fp)
        wr.writerow(["date", materialize["noaa_datatype_id"]])
        for date, avg in rollup_by_date(data):
            wr.writerow([date, avg])
            if size_limit is not None and fp.tell() > size_limit:
                raise DatasetTooBig(limit=size_limit)
