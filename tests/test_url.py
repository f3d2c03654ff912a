"""URL canonicalization + capture resolution (round-5 fourth wave).

Parity: the Spark canonicalizer (functions/url.py with_canonical_url)
and its DuckDB rendering (canonical_url_sql) must agree byte-for-byte
on adversarial URLs — that parity is what makes the dedup_url value
oracle meaningful.
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from spanmarkerner_spark.functions.url import (
    canonical_url_sql,
    with_canonical_url,
)
from spanmarkerner_spark.operators.dedup import resolve_captures

ADVERSARIAL = [
    # fragment stripped
    "https://example.org/a#frag",
    "https://example.org/a",
    # scheme+host lowercased, path case preserved
    "HTTPS://Example.ORG/CaseSensitive/Path",
    # http -> https, www stripped
    "http://www.example.org/a",
    # tracking params dropped, survivors sorted
    "https://example.org/a?utm_source=x&b=2&a=1",
    "https://example.org/a?a=1&b=2&utm_campaign=y&fbclid=zz&gclid=q",
    # all params tracking -> no query at all
    "https://example.org/a?utm_source=x",
    # trailing slashes stripped (incl. multiple)
    "https://example.org/a/",
    "https://example.org/a///",
    # bare host, root slash
    "https://example.org",
    "https://example.org/",
    # multiple '?' (second is literal data, rejoined)
    "https://example.org/a?x=1?y=2&b=3",
    # empty params from '&&' are dropped
    "https://example.org/a?&&a=1",
    # utm_ prefix must be literal (LIKE-underscore bug guard):
    # 'utmx=1' is NOT a tracking param
    "https://example.org/a?utmx=1",
    # '#' before '?': everything after # goes, including the query
    "https://example.org/a#f?utm_source=x",
]


def test_canonicalizer_matches_duckdb_rendering(spark):
    sdf = spark.createDataFrame([(u,) for u in ADVERSARIAL], ["url"])
    got = {
        r["url"]: r["canonical_url"]
        for r in with_canonical_url(sdf).collect()
    }
    duck = duckdb.connect()
    for u in ADVERSARIAL:
        (exp,) = duck.execute(
            f"SELECT {canonical_url_sql('url')} FROM (SELECT ? AS url)", [u]
        ).fetchone()
        assert got[u] == exp, f"{u!r}: spark={got[u]!r} duck={exp!r}"


def test_canonicalizer_semantics_hand_values(spark):
    sdf = spark.createDataFrame([(u,) for u in ADVERSARIAL], ["url"])
    got = {
        r["url"]: r["canonical_url"]
        for r in with_canonical_url(sdf).collect()
    }
    assert got["https://example.org/a#frag"] == "https://example.org/a"
    assert (
        got["HTTPS://Example.ORG/CaseSensitive/Path"]
        == "https://example.org/CaseSensitive/Path"
    )
    assert got["http://www.example.org/a"] == "https://example.org/a"
    assert (
        got["https://example.org/a?utm_source=x&b=2&a=1"]
        == "https://example.org/a?a=1&b=2"
    )
    assert got["https://example.org/a?utm_source=x"] == "https://example.org/a"
    assert got["https://example.org/a///"] == "https://example.org/a"
    assert got["https://example.org/"] == "https://example.org"
    assert got["https://example.org/a?utmx=1"] == "https://example.org/a?utmx=1"
    assert got["https://example.org/a#f?utm_source=x"] == "https://example.org/a"
    # variants that denote the same page all collapse to one key
    same = {
        got[u]
        for u in (
            "https://example.org/a",
            "https://example.org/a#frag",
            "http://www.example.org/a",
            "https://example.org/a/",
            "https://example.org/a?utm_source=x",
        )
    }
    assert same == {"https://example.org/a"}


def test_resolve_captures_newest_wins_and_counts(spark):
    caps = spark.createDataFrame(
        [
            # 3 captures of one page under variant urls
            ("https://example.org/a?utm_source=x", 100),
            ("http://www.example.org/a", 300),
            ("https://example.org/a/", 200),
            # singleton page
            ("https://example.org/b", 50),
            # tie on ts -> max raw url wins (deterministic)
            ("https://example.org/c#one", 7),
            ("https://example.org/c#two", 7),
        ],
        ["url", "warc_ts"],
    )
    got = {
        r["canonical_url"]: r
        for r in resolve_captures(caps, ts_col="warc_ts").collect()
    }
    assert set(got) == {
        "https://example.org/a",
        "https://example.org/b",
        "https://example.org/c",
    }
    a = got["https://example.org/a"]
    assert a["n_captures"] == 3
    assert a["kept_ts"] == 300
    assert a["kept_url"] == "http://www.example.org/a"
    assert got["https://example.org/b"]["n_captures"] == 1
    c = got["https://example.org/c"]
    assert c["kept_url"] == "https://example.org/c#two"  # max url tie-break


def test_with_canonical_url_rejects_temp_collision(spark):
    sdf = spark.createDataFrame([("https://x.org", 1)], ["url", "_base"])
    with pytest.raises(ValueError, match="temp column collision"):
        with_canonical_url(sdf)


def test_with_canonical_url_plan_is_shuffle_free(spark):
    """Canonicalization must stay a map-side projection: no Exchange
    in the optimized plan over a plain scan."""
    sdf = spark.range(100).select(
        F.concat(F.lit("https://example.org/p/"), F.col("id")).alias("url")
    )
    plan = (
        with_canonical_url(sdf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
