"""URL canonicalization — the cheapest, highest-frequency dedup stage in a
crawl pipeline: before any content is shingled or embedded, fold the many
spellings of one page into a single canonical key and keep one fetch per key.

All helpers are PURE COLUMN EXPRESSION builders (built-in string/array
functions only — regexp_extract / regexp_replace / filter / array_sort), so
every stage stays inside whole-stage codegen: at 100 TB this runs as a
map-side projection over the URL column with zero Python and zero shuffle;
the only exchange in a canonical-URL dedup is the final groupBy on the
canonical key (an 8-byte hash of it in production).

Rules implemented (the common-crawl-style page-identity canon — lossy by
design, the point is a dedup KEY, not a fetchable address):
  1. scheme and host lowercased (RFC 3986 §6.2.2.1);
  2. http folded to https (page-identity: the same page served on both);
  3. default ports stripped (http:80 / https:443, RFC 3986 §6.2.3);
  4. fragment dropped (never sent to the server);
  5. tracking query params removed (utm_*, ref, fbclid, gclid);
  6. remaining query params sorted bytewise (order-insensitive identity);
  7. trailing /index.html and trailing slashes normalized ('' -> '/').

cf. reference `dags/cms_inpatient_download_unzip.py:22` (single-URL HTTP
ingest — the canonicalizer is what that stage needs the moment the source is
a crawl frontier instead of one fixed CMS zip).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# one alternation, anchored at the key= boundary so e.g. `reference=x` is KEPT
# (only the exact `ref` key and the utm_/clid families are tracking params)
TRACKING_PARAM_RE = "^(utm_[^=]*|ref|fbclid|gclid)="

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def url_scheme(url: Column) -> Column:
    """Lowercased scheme ('' when the value is not a hierarchical URL)."""
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def url_hostport(url: Column) -> Column:
    """Lowercased host[:port] authority component."""
    return F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1))


def url_path(url: Column) -> Column:
    """Raw path component (case preserved — paths are case-sensitive)."""
    return F.regexp_extract(url, _PATH_RE, 1)


def url_query(url: Column) -> Column:
    """Raw query string without the leading '?' ('' when absent)."""
    return F.regexp_extract(url, _QUERY_RE, 1)


def canonical_host(url: Column) -> Column:
    """Lowercased host with the ORIGINAL scheme's default port stripped."""
    scheme = url_scheme(url)
    hp = url_hostport(url)
    return (
        F.when(scheme == "http", F.regexp_replace(hp, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hp, ":443$", ""))
        .otherwise(hp)
    )


def canonical_path(url: Column) -> Column:
    """Path with trailing /index.html and trailing slashes removed; '' -> '/'."""
    p = F.regexp_replace(url_path(url), r"/index\.html$", "")
    p = F.regexp_replace(p, "/+$", "")
    return F.when(p == "", F.lit("/")).otherwise(p)


def canonical_query(url: Column) -> Column:
    """Query with tracking params dropped and the rest bytewise-sorted.

    split('') yields [''] in both Spark and DuckDB, and the p != '' filter
    drops it, so the empty-query case needs no special branch.
    """
    parts = F.split(url_query(url), "&")
    kept = F.filter(
        parts,
        lambda p: (p != F.lit("")) & ~F.lower(p).rlike(TRACKING_PARAM_RE),
    )
    return F.concat_ws("&", F.array_sort(kept))


def canonicalize_url(url: Column) -> Column:
    """The full canonical page-identity key (rules 1-7 above)."""
    scheme = url_scheme(url)
    folded = F.when(scheme == "http", F.lit("https")).otherwise(scheme)
    qs = canonical_query(url)
    return F.concat(
        folded,
        F.lit("://"),
        canonical_host(url),
        canonical_path(url),
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )


def registrable_domain(host: Column) -> Column:
    """Last two dot-labels of an (already port-free) host — the public-suffix
    heuristic that covers .com/.org/.net style hosts; a production deployment
    swaps in the Public Suffix List as a broadcast dimension join, which this
    column feeds as the join key."""
    return F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)


def host_tld(host: Column) -> Column:
    """Final dot-label of the host ('com', 'org', ...)."""
    return F.regexp_extract(host, r"\.([^.]+)$", 1)
