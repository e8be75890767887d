"""URL canonicalization — the crawl-dedup normalization stage
(Common-Crawl-style pipelines canonicalize before url-keyed joins,
frontier dedup and host rollups).

Rules, applied in this exact order (each is one vectorized pandas
string op; the same sequence is reproducible in SQL, so the gate is
value-exact on the output strings):

    1. drop the fragment        (everything from the first '#')
    2. split off the query      (first '?')
    3. lowercase the scheme     (before '://')
    4. lowercase host[:port]    (up to the first '/' after scheme)
    5. strip the default port   (':443' for https, ':80' for http)
    6. strip ONE trailing '/'   (only when the path is longer than '/')
    7. sort query parameters    ('&'-split, lexicographic, rejoin)

Step 7 is the only per-row Python (sorted on a short list) and runs
ONLY on rows that carry a query string — crawl corpora are dominated
by query-less urls, so the hot path stays vectorized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def canonicalize_urls(urls: pd.Series) -> pd.Series:
    if len(urls) == 0:  # expand=True split yields no columns on empty
        return urls.astype(str)
    s = urls.astype(str)
    s = s.str.split("#", n=1).str[0]  # 1. fragment
    parts = s.str.split("?", n=1)  # 2. query off
    base = parts.str[0]
    query = parts.str[1]  # NaN when absent
    scheme_rest = base.str.split("://", n=1, expand=True)
    scheme = scheme_rest[0].str.lower()  # 3.
    rest = scheme_rest[1].fillna("")
    slash = rest.str.find("/")
    has_slash = slash >= 0
    hostport = rest.where(~has_slash, rest.str.split("/", n=1).str[0]).str.lower()
    path = np.where(
        has_slash, "/" + rest.str.split("/", n=1).str[1].fillna(""), "/"
    )
    path = pd.Series(path, index=s.index)
    is_https = scheme == "https"
    is_http = scheme == "http"
    hostport = hostport.where(
        ~(is_https & hostport.str.endswith(":443")), hostport.str[:-4]
    )
    hostport = hostport.where(
        ~(is_http & hostport.str.endswith(":80")), hostport.str[:-3]
    )
    trail = (path.str.len() > 1) & path.str.endswith("/")
    path = path.where(~trail, path.str[:-1])
    canon = scheme + "://" + hostport + path
    has_q = query.notna() & (query != "")
    if has_q.any():
        sorted_q = (
            query[has_q].str.split("&").map(sorted).str.join("&")
        )
        canon = canon.where(~has_q, canon + "?" + sorted_q)
    return canon
