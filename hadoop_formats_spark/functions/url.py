"""URL normalization column functions for web-scale corpus curation:
canonicalization (the dedup key for crawl snapshots of the same page)
and registrable-domain extraction (the grouping key for per-site
quotas, domain blocklists, and provenance stats).

Like ``functions.text``, everything here is a pure Catalyst column
expression — JVM-side, codegen-friendly, SQL-expressible for the
DuckDB oracle.  No Python UDF touches the hot path, so these run at
full scan speed over a 100 TB crawl.

The canonical form implemented (deliberately conservative — it only
merges variants that are behaviorally identical for HTTP):

* scheme and host lowercased;
* fragment stripped (never sent to the server);
* default ports stripped (``:80`` for http, ``:443`` for https);
* empty path → ``/``;
* tracking query parameters dropped (``utm_*``, ``fbclid``, ``gclid``,
  ``msclkid``, ``ref``) — they vary per click, not per page;
* surviving query parameters sorted byte-wise (param order is
  almost always insignificant; sorting merges reorderings).

Path case, non-tracking params, and trailing slashes are preserved:
they CAN be significant, and a curation dedup key must not merge
distinct pages.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# dropped-parameter regex, shared verbatim with the SQL oracle
TRACKING_PARAM_RE = "^(utm_[^=]*|fbclid|gclid|msclkid|ref)="

# second-level labels under which a third label is needed to identify
# the registrant (a tiny, fixed stand-in for the public-suffix list;
# swap in the real PSL table as a broadcast join for production crawls)
MULTI_PART_SLDS = ["co", "com", "org", "net", "ac", "gov", "edu"]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_scheme(url: Column | str) -> Column:
    """Lowercased scheme, '' if absent."""
    return F.lower(F.regexp_extract(_c(url), r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))


def url_hostport(url: Column | str) -> Column:
    """Raw host[:port] section (original case), '' if not a URL."""
    return F.regexp_extract(_c(url), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)


def url_host(url: Column | str) -> Column:
    """Lowercased host with any explicit port removed."""
    return F.lower(F.regexp_replace(url_hostport(url), r":\d+$", ""))


def url_path(url: Column | str) -> Column:
    """Path component ('' when absent; canonicalize_url maps '' → '/')."""
    return F.regexp_extract(
        _c(url), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )


def url_query(url: Column | str) -> Column:
    """Query string without the leading '?' ('' when absent).  The
    match is anchored past the first '#': a '?' occurring inside the
    fragment ('#sec?x=1', text-fragment links) is NOT a query — an
    unanchored match would resurrect fragment text as query params and
    merge distinct pages."""
    return F.regexp_extract(_c(url), r"^[^#?]*\?([^#]*)", 1)


def canonical_query(url: Column | str) -> Column:
    """Query string with tracking params dropped and the survivors
    byte-sorted; '' when nothing survives."""
    params = F.filter(
        F.split(url_query(url), "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    return F.array_join(F.array_sort(params), "&")


def canonicalize_url(url: Column | str) -> Column:
    """The canonical dedup key for a URL (see module docstring)."""
    scheme = url_scheme(url)
    host = url_host(url)
    hostport = F.lower(url_hostport(url))
    # keep a NON-default explicit port; drop :80 on http / :443 on https
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    default = F.when(scheme == "http", F.lit("80")).when(
        scheme == "https", F.lit("443")
    )
    port_part = F.when(
        (port != "") & (port != F.coalesce(default, F.lit(""))),
        F.concat(F.lit(":"), port),
    ).otherwise(F.lit(""))
    path = url_path(url)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = canonical_query(url)
    q_part = F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port_part, path, q_part)


def registrable_domain(host: Column | str) -> Column:
    """eTLD+1 approximation: last two host labels, or last three when
    the second-to-last is a known multi-part SLD (``co.uk`` et al.) and
    enough labels exist."""
    h = _c(host)
    parts = F.split(h, r"\.")
    n = F.size(parts)
    two = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    three = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1)
    )
    multi = F.element_at(parts, -2).isin(MULTI_PART_SLDS)
    return (
        F.when(n <= 2, h)
        .when(multi & (n >= 3), three)
        .otherwise(two)
    )
