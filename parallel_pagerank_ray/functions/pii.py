"""PII detection and redaction — a standard training-data pipeline
stage the reference lacks (beyond-reference capability, same family as
dedup/decontamination).

Two operators over a ``documents``-shaped table:

- ``pii_scan``   — (doc_id, n_emails, n_ipv4, n_phones, has_pii):
                   per-category match counts on the ORIGINAL text.
- ``pii_redact`` — (doc_id, text): matches replaced by typed tokens
                   (``<EMAIL>`` / ``<IPV4>`` / ``<PHONE>``), applied in
                   a FIXED order (email, ipv4, phone) so output is
                   deterministic when categories could overlap.

Scale shape: one stateless vectorized ``map_batches`` — regexes are
compiled once per task closure and applied via pandas' C-level str
kernels; no shuffle, no state, text never leaves the map. At 100 TB
this is embarrassingly parallel and streams block by block.

The patterns are deliberately RE2-compatible AND Python-``re``
-equivalent (character classes, bounded repeats, ``\\b`` word
boundaries; no lookaround), so the DuckDB oracle reproduces counts and
redactions exactly (``regexp_extract_all`` / nested ``regexp_replace``
with the 'g' flag) — the engine output is value-checkable end to end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

# leftmost non-overlapping in both Python re and RE2; keep in sync with
# the SQL mirror in __ray_entry__._pii_sql
EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"

# (pattern, redaction token) in application order — email first (its
# local part may contain digits and dots that would otherwise shadow
# the numeric patterns), then ipv4, then phone
_RULES: tuple[tuple[str, str], ...] = (
    (EMAIL, "<EMAIL>"),
    (IPV4, "<IPV4>"),
    (PHONE, "<PHONE>"),
)


def pii_scan(docs: rd.Dataset) -> rd.Dataset:
    """Per-doc PII match counts: (doc_id, n_emails, n_ipv4, n_phones,
    has_pii). Counts are independent per category, all measured on the
    original text (unlike redaction, which is sequential)."""
    import re

    email_re = re.compile(EMAIL)
    ipv4_re = re.compile(IPV4)
    phone_re = re.compile(PHONE)

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].astype(str)
        n_em = t.str.count(email_re).to_numpy(dtype=np.int64)
        n_ip = t.str.count(ipv4_re).to_numpy(dtype=np.int64)
        n_ph = t.str.count(phone_re).to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy().astype(np.int64),
                "n_emails": n_em,
                "n_ipv4": n_ip,
                "n_phones": n_ph,
                "has_pii": (n_em + n_ip + n_ph) > 0,
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        scan, batch_format="pandas"
    )


def pii_redact(docs: rd.Dataset) -> rd.Dataset:
    """Redacted corpus: (doc_id, text) with every match replaced by its
    typed token, rules applied in the fixed _RULES order."""
    import re

    rules = [(re.compile(p), tok) for p, tok in _RULES]

    def redact(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].astype(str)
        for pat, tok in rules:
            t = t.str.replace(pat, tok, regex=True)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy().astype(np.int64),
                "text": t.to_numpy(),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        redact, batch_format="pandas"
    )
