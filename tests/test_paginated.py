"""Paginated API scan: retry/backoff semantics + resumable ingest.

Network-free: a deterministic flaky fake stands in for the Data API
(reference api_importer/clients/data.py:46-121 — Retry(total=5,
backoff_factor=0.2, status_forcelist=[429,503]) + link-chasing
``_query``); sleeps are injected and recorded, never real.
"""

import pytest

from pda_spark.sources.paginated import (
    TransientHTTPError,
    iter_linked_pages,
    scan_linked,
    scan_offset,
    with_retries,
)


class FlakyAPI:
    """3 pages of features; every page URL 429s ``fail_n`` times before
    succeeding; optionally dies hard after ``die_after_pages``."""

    def __init__(self, fail_n=2, die_after_pages=None):
        self.fail_n = fail_n
        self.die_after_pages = die_after_pages
        self.calls = {}
        self.pages_served = 0
        self.pages = {
            "p1": {"features": [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}],
                   "_links": {"_next": "p2"}},
            "p2": {"features": [{"id": 3, "v": "c"}, {"id": 4, "v": "d"}],
                   "_links": {"_next": "p3"}},
            "p3": {"features": [{"id": 5, "v": "e"}], "_links": {}},
        }

    def _serve(self, url):
        n = self.calls.get(url, 0)
        self.calls[url] = n + 1
        if n < self.fail_n:
            raise TransientHTTPError(429, url)
        if self.die_after_pages is not None and self.pages_served >= self.die_after_pages:
            raise RuntimeError("killed mid-scan")
        self.pages_served += 1
        return self.pages[url]

    def post(self, query):
        return self._serve("p1")

    def get(self, url):
        return self._serve(url)


def test_with_retries_backoff_sequence():
    slept = []
    api = FlakyAPI(fail_n=4)
    out = with_retries(lambda: api.post({}), total=5, backoff_factor=0.2,
                       sleep=slept.append)
    assert out["features"][0]["id"] == 1
    # urllib3 semantics: first retry immediate, then 0.2 * 2**(k-1)
    assert slept == [0.2, 0.4, 0.8]
    # exhausting the budget propagates the last 429
    api2 = FlakyAPI(fail_n=99)
    with pytest.raises(TransientHTTPError):
        with_retries(lambda: api2.post({}), total=3, sleep=lambda s: None)
    assert api2.calls["p1"] == 4  # 1 try + 3 retries
    # non-retryable status propagates immediately
    def teapot():
        raise TransientHTTPError(418)
    with pytest.raises(TransientHTTPError):
        with_retries(teapot, total=5, sleep=lambda s: None)


def test_iter_linked_pages_lazy_and_complete():
    api = FlakyAPI()
    retry = {"sleep": lambda s: None}
    pages = list(iter_linked_pages(api.post, api.get, {}, retry=retry))
    assert [f["id"] for p in pages for f in p] == [1, 2, 3, 4, 5]
    # each URL was retried past its two 429s exactly once
    assert api.calls == {"p1": 3, "p2": 3, "p3": 3}


def test_scan_linked_resumes_without_duplicates(spark, tmp_path):
    from pda_spark.sources.checkpoint import CheckpointManager

    retry = {"sleep": lambda s: None}
    schema = "id long, v string"
    ckpt = CheckpointManager(spark, str(tmp_path / "ckpt"))
    # first run dies after 2 pages: one 1-page batch already committed
    api = FlakyAPI(die_after_pages=2)
    with pytest.raises(RuntimeError):
        scan_linked(spark, api.post, api.get, {}, schema, ckpt,
                    stage="items", page_batch=1, retry=retry)
    committed = {r["id"] for r in ckpt.read("items").collect()}
    assert committed and committed < {1, 2, 3, 4, 5}
    # resume: full re-scan, merge_append dedups the already-landed rows
    api2 = FlakyAPI()
    out = scan_linked(spark, api2.post, api2.get, {}, schema, ckpt,
                      stage="items", page_batch=1, retry=retry)
    rows = sorted((r["id"], r["v"]) for r in out.collect())
    assert rows == [(1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e")]
    assert ckpt.manifest("items")["rows"] == 5


def test_scan_offset_distributed_fetch(spark):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("page", T.LongType()),
    ])

    def fetch_page(pid: int):
        # deterministic flake: odd pages 429 once per attempt count is
        # impossible to track across executors, so flake on first item id
        return [{"id": pid * 10 + i, "page": pid} for i in range(3)]

    out = scan_offset(spark, fetch_page, n_pages=6, schema=schema, partitions=3)
    rows = sorted(r["id"] for r in out.collect())
    assert rows == sorted(p * 10 + i for p in range(6) for i in range(3))
    assert out.rdd.getNumPartitions() == 3
