"""URL analysis for web-corpus curation (host/domain extraction,
tracking-parameter stripping). All pure regex codegen — zero shuffle —
with patterns restricted to the Java∩RE2 common subset so the DuckDB
oracles run the SAME expressions. A 100 TB crawl groups/filters by these
columns, so they must be cheap per-row and deterministic."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# scheme://[userinfo@]HOST[:port]/...
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"


def url_host(col: Column) -> Column:
    """Lowercased host (userinfo and port stripped); '' for non-URLs."""
    return F.lower(F.regexp_extract(col, _HOST_RE, 1))


def url_domain(col: Column) -> Column:
    """Host with a leading 'www.' removed — the dedup/grouping key for
    crawl frontier policies."""
    return F.regexp_replace(url_host(col), r"^www\.", "")


def registered_domain(col: Column) -> Column:
    """Last two labels of the domain (example.com). NAIVE: correct for
    gTLDs, wrong for ccTLD second-level registries (co.uk) — a real
    public-suffix-list lookup is a broadcast join against the PSL table;
    this is the zero-dependency approximation, documented as such."""
    return F.regexp_extract(url_domain(col), r"([^.]+\.[^.]+)$", 1)


def url_path(col: Column) -> Column:
    return F.regexp_extract(col, _PATH_RE, 1)


def strip_tracking_params(col: Column) -> Column:
    """Remove utm_* query parameters (the canonicalization step before
    URL-level dedup); trailing '?'/'&' left by the removal is cleaned."""
    out = F.regexp_replace(col, r"(utm_[a-z]+=[^&#]*&?)", "")
    return F.regexp_replace(out, r"[?&]$", "")
