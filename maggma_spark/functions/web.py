"""Web-corpus column expressions — URL canonicalization.

Beyond-reference capability: a crawl-derived training corpus dedups and
joins on CANONICAL urls (case-folded scheme/host, no fragment, no
tracking params, no trailing slash) — raw url strings split the same
page across dozens of variants.

Pure JVM regexp/substring expressions; every pattern is valid in BOTH
Java regex and RE2, so external tooling (DuckDB audits, Go crawlers) can
recompute the canonical form bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# scheme://authority — the only part of a URL that is case-insensitive
_PREFIX_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"


def canonicalize_url(url: Column | str) -> Column:
    """Canonical URL form, applied in a fixed order:

    1. strip the fragment (``#...``);
    2. strip ``utm_*`` tracking parameters (and a dangling ``?``/``&``);
    3. strip trailing slashes from the path;
    4. lowercase the scheme+authority prefix (path/query stay
       case-sensitive per RFC 3986) and drop a leading ``www.``.
    """
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(u, r"#.*$", "")
    # kill each utm_ param, then repair separators left behind
    u = F.regexp_replace(u, r"utm_[A-Za-z0-9_]*=[^&#]*&?", "")
    u = F.regexp_replace(u, r"[?&]$", "")
    u = F.regexp_replace(u, r"\?&", "?")
    u = F.regexp_replace(u, r"/+$", "")
    prefix = F.regexp_extract(u, _PREFIX_RE, 1)
    rest = F.substring(u, F.length(prefix) + F.lit(1), F.lit(1 << 30))
    lowered = F.regexp_replace(F.lower(prefix), r"://www\.", "://")
    return F.concat(lowered, rest)
