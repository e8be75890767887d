"""URL canonicalization rules (functions/urlnorm.py)."""

import pandas as pd

from parallel_pagerank_ray.functions.urlnorm import canonicalize_urls


def test_canonicalize_rules():
    got = canonicalize_urls(
        pd.Series(
            [
                "HTTPS://Docs.Example:443/p12/?b=2&a=1#frag",
                "https://docs.example/p5",
                "http://A.EX:80/x/",
                "https://h.ex",
                "https://h.ex/?z=1",
                "https://h.ex/a//",
                "HTTP://H.EX:8080/keep:port",
                "https://h.ex/p#only-fragment",
            ]
        )
    ).tolist()
    assert got == [
        "https://docs.example/p12?a=1&b=2",
        "https://docs.example/p5",
        "http://a.ex/x",
        "https://h.ex/",
        "https://h.ex/?z=1",
        "https://h.ex/a/",  # strips exactly ONE trailing slash
        "http://h.ex:8080/keep:port",  # non-default port preserved
        "https://h.ex/p",
    ]


def test_canonical_idempotent():
    urls = pd.Series(
        ["HTTPS://A.EX:443/p/?c=3&b=2&a=1#f", "http://b.ex:80/"]
    )
    once = canonicalize_urls(urls)
    twice = canonicalize_urls(once)
    assert once.tolist() == twice.tolist()


def test_canonical_empty_series():
    assert canonicalize_urls(pd.Series([], dtype=str)).tolist() == []
