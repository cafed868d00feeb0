"""Crawl front-end queries — the stages a web-scale corpus runs BEFORE any
content-level dedup/quality stage sees a byte of text (round-12 additions):

  * ``text_html_strip_c4``     — C4-style markup -> visible text extraction
                                 with line- and page-level cleanse rules;
  * ``dedup_url_canonical``    — URL canonicalization + first-by-canonical
                                 dedup (the cheapest, highest-frequency
                                 real-world dedup stage);
  * ``filter_domain_blocklist``— registrable-domain / TLD crawl filter
                                 against a broadcast blocklist dimension.

The ``documents`` fixture carries no markup or URL column, so each query
PLANTS a deterministic fixture from (doc_id, source, text) — six URL
spellings of the same page, pages with/without enough sentences, planted
brace/lorem/javascript boilerplate — identically in the Spark code and the
DuckDB oracle (the ``corpus_curation_v8`` delta-planting discipline: the
construction is shared, the OPERATOR under test is independently
implemented on each engine).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_cms_inpatient_etl_spark.operators.htmltext import (
    MIN_LINE_WORDS,
    MIN_PAGE_LINES,
    c4_kept_lines,
    c4_page_kept,
    visible_lines,
)
from airflow_cms_inpatient_etl_spark.operators.weburl import (
    TRACKING_PARAM_RE,
    canonical_host,
    canonicalize_url,
    host_tld,
    registrable_domain,
)
from airflow_cms_inpatient_etl_spark.queries.base import register
from airflow_cms_inpatient_etl_spark.sources.registry import load_table, spread_scan

# --------------------------------------------------------------------------- #
# shared URL fixture: 6 spellings of each page, 3 consecutive docs per page    #
# --------------------------------------------------------------------------- #
# page identity = doc_id div 3; host derives from the PAGE (not the doc's
# source) so the spellings of one page agree on authority; spelling variant
# = doc_id % 6 exercises every canonicalization rule: uppercase scheme+host,
# default ports (:443/:80), http->https fold, fragment strip, tracking params
# (utm_*/ref/fbclid) in varying positions, param-order shuffle (z=9 vs id=),
# trailing slash, /index.html, and an empty path ('' -> '/').


def _fixture_urls(d):
    """(doc_id, url) with the 6-variant spelling plant."""
    page = F.expr("doc_id div 3")
    k = page % 12
    tld = (
        F.when(k % 3 == 0, F.lit("com"))
        .when(k % 3 == 1, F.lit("org"))
        .otherwise(F.lit("net"))
    )
    host = F.concat(F.lit("www.site"), k.cast("string"), F.lit("."), tld)
    ps = page.cast("string")
    v = F.col("doc_id") % 6
    url = (
        F.when(
            v == 0,
            F.concat(
                F.lit("HTTPS://"), F.upper(host), F.lit(":443/Articles/"), ps,
                F.lit("?utm_source=feed&id="), ps, F.lit("&z=9"),
            ),
        )
        .when(
            v == 1,
            F.concat(
                F.lit("https://"), host, F.lit("/Articles/"), ps,
                F.lit("/?z=9&id="), ps, F.lit("#section-2"),
            ),
        )
        .when(
            v == 2,
            F.concat(
                F.lit("http://"), host, F.lit(":80/Articles/"), ps,
                F.lit("?id="), ps, F.lit("&z=9&utm_campaign=spring"),
            ),
        )
        .when(
            v == 3,
            F.concat(
                F.lit("https://"), host, F.lit("/Articles/"), ps,
                F.lit("?ref=tw&z=9&id="), ps,
            ),
        )
        .when(
            v == 4,
            F.concat(
                F.lit("https://"), host, F.lit("/Articles/"), ps,
                F.lit("/index.html?id="), ps, F.lit("&z=9"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://"), host, F.lit("?z=9&id="), ps, F.lit("&fbclid=xyz"),
            )
        )
    )
    return d.select("doc_id", url.alias("url"))


_FIXTURE_URLS_SQL = """
    u AS (
        SELECT doc_id, doc_id // 3 AS page, (doc_id // 3) % 12 AS k FROM documents
    ),
    h AS (
        SELECT doc_id, page,
               'www.site' || k || '.' ||
                 CASE k % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org' ELSE 'net' END
                 AS host
        FROM u
    ),
    urls AS (
        SELECT doc_id,
          CASE doc_id % 6
            WHEN 0 THEN 'HTTPS://' || UPPER(host) || ':443/Articles/' || page
                        || '?utm_source=feed&id=' || page || '&z=9'
            WHEN 1 THEN 'https://' || host || '/Articles/' || page
                        || '/?z=9&id=' || page || '#section-2'
            WHEN 2 THEN 'http://' || host || ':80/Articles/' || page
                        || '?id=' || page || '&z=9&utm_campaign=spring'
            WHEN 3 THEN 'https://' || host || '/Articles/' || page
                        || '?ref=tw&z=9&id=' || page
            WHEN 4 THEN 'https://' || host || '/Articles/' || page
                        || '/index.html?id=' || page || '&z=9'
            ELSE 'https://' || host || '?z=9&id=' || page || '&fbclid=xyz'
          END AS url
        FROM h
    )
"""

# DuckDB mirror of operators.weburl (independently implemented: SQL CASE /
# regexp / list functions, same rules)
_CANON_PARTS_SQL = """
    parts AS (
        SELECT doc_id, url,
               LOWER(REGEXP_EXTRACT(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
               LOWER(REGEXP_EXTRACT(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hostport,
               REGEXP_EXTRACT(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS rawpath,
               REGEXP_EXTRACT(url, '\\?([^#]*)', 1) AS rawq
        FROM urls
    ),
    canon AS (
        SELECT doc_id, url,
               CASE WHEN scheme = 'http' THEN 'https' ELSE scheme END AS cscheme,
               CASE WHEN scheme = 'http' THEN REGEXP_REPLACE(hostport, ':80$', '')
                    WHEN scheme = 'https' THEN REGEXP_REPLACE(hostport, ':443$', '')
                    ELSE hostport END AS chost,
               CASE WHEN REGEXP_REPLACE(REGEXP_REPLACE(rawpath, '/index\\.html$', ''), '/+$', '') = ''
                    THEN '/'
                    ELSE REGEXP_REPLACE(REGEXP_REPLACE(rawpath, '/index\\.html$', ''), '/+$', '')
               END AS cpath,
               COALESCE(ARRAY_TO_STRING(LIST_SORT(LIST_FILTER(
                   STRING_SPLIT(rawq, '&'),
                   p -> p <> '' AND NOT REGEXP_MATCHES(LOWER(p), '{tracking_re}')
               )), '&'), '') AS cq
        FROM parts
    ),
    canonical AS (
        SELECT doc_id, url,
               cscheme || '://' || chost || cpath ||
                 CASE WHEN cq = '' THEN '' ELSE '?' || cq END AS canonical_url
        FROM canon
    )
""".replace("{tracking_re}", TRACKING_PARAM_RE)


@register(
    "dedup_url_canonical",
    oracle=f"""
    WITH {_FIXTURE_URLS_SQL},
    {_CANON_PARTS_SQL}
    SELECT canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_dupes,
           CAST(COUNT(DISTINCT url) AS BIGINT) AS n_spellings,
           MIN(doc_id) AS keep_doc_id
    FROM canonical
    GROUP BY canonical_url
    """,
)
def dedup_url_canonical(spark, sf_dir):
    """URL canonicalization + first-by-canonical-URL dedup — the cheapest,
    highest-frequency dedup stage in a real crawl pipeline: fold scheme/host
    case, http->https, default ports, fragments, tracking params (utm_*,
    ref, fbclid, gclid), param order, /index.html and trailing slashes into
    one page-identity key, then keep the lowest doc_id per key.

    The fixture plants six spellings per page (three consecutive docs each),
    so every rule separates observably: most canonical groups carry 2-3
    spellings, while the variant-5 spelling (empty path -> '/') correctly
    forms its own page identity.

    Scale shape: canonicalization is one map-side codegen'd projection
    (regex + array HOFs, zero Python); the ONLY exchange is the final
    groupBy on the canonical key — at 100 TB that key is hashed to 8 bytes
    and the groupBy is a near-uniform shuffle (page keys don't skew the way
    content hashes of boilerplate do).  cf. reference
    `dags/cms_inpatient_download_unzip.py:22` (fixed-URL ingest)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    urls = _fixture_urls(d)
    return (
        urls.select("doc_id", "url", canonicalize_url(F.col("url")).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dupes"),
            F.countDistinct("url").cast("long").alias("n_spellings"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )


_BLOCKLIST = ["site0.com", "site4.org", "site5.net", "site9.com", "blocked.example"]


@register(
    "filter_domain_blocklist",
    oracle=f"""
    WITH {_FIXTURE_URLS_SQL},
    hosts AS (
        SELECT doc_id,
               LOWER(REGEXP_EXTRACT(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
               LOWER(REGEXP_EXTRACT(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hostport
        FROM urls
    ),
    doms AS (
        SELECT doc_id,
               REGEXP_EXTRACT(h2, '([^.]+\\.[^.]+)$', 1) AS domain,
               REGEXP_EXTRACT(h2, '\\.([^.]+)$', 1) AS tld
        FROM (
            SELECT doc_id,
                   CASE WHEN scheme = 'http' THEN REGEXP_REPLACE(hostport, ':80$', '')
                        WHEN scheme = 'https' THEN REGEXP_REPLACE(hostport, ':443$', '')
                        ELSE hostport END AS h2
            FROM hosts
        )
    ),
    agg AS (
        SELECT domain, tld, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM doms GROUP BY domain, tld
    ),
    blocklist(domain) AS (VALUES {", ".join(f"('{x}')" for x in _BLOCKLIST)})
    SELECT a.domain, a.tld, a.n_docs,
           b.domain IS NOT NULL AS in_blocklist,
           a.tld = 'net' AS tld_blocked,
           (b.domain IS NOT NULL OR a.tld = 'net') AS is_blocked
    FROM agg a LEFT JOIN blocklist b ON a.domain = b.domain
    """,
)
def filter_domain_blocklist(spark, sf_dir):
    """Registrable-domain / TLD crawl filter: roll the corpus up to its
    registrable domains (public-suffix-lite: last two host labels), then
    flag each against (a) an explicit domain blocklist — a BROADCAST
    dimension join, the posture a multi-million-entry production blocklist
    keeps at 100 TB — and (b) a TLD policy rule ('net' here; spam TLD lists
    in production), evaluated map-side.

    The aggregation runs BEFORE the blocklist join, so the join touches
    domain-count rows (thousands), never corpus rows — at 100 TB the
    blocklist broadcast also pushes into the scan as a filter when used as
    a gate rather than a report.  One spelled-out blocklist entry
    ('blocked.example') matches nothing, proving left-join semantics."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    urls = _fixture_urls(d)
    host = canonical_host(F.col("url"))
    labeled = urls.select(
        "doc_id",
        registrable_domain(host).alias("domain"),
        host_tld(host).alias("tld"),
    )
    bl = (
        spark.createDataFrame([(x,) for x in _BLOCKLIST], "domain string")
        .withColumn("__bl", F.lit(True))
    )
    return (
        labeled.groupBy("domain", "tld")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .join(F.broadcast(bl), "domain", "left")
        .select(
            "domain",
            "tld",
            "n_docs",
            F.coalesce("__bl", F.lit(False)).alias("in_blocklist"),
            (F.col("tld") == "net").alias("tld_blocked"),
            (F.coalesce("__bl", F.lit(False)) | (F.col("tld") == "net")).alias(
                "is_blocked"
            ),
        )
    )


# --------------------------------------------------------------------------- #
# text_html_strip_c4 — markup -> visible text with C4 cleanse rules            #
# --------------------------------------------------------------------------- #
# fixture page plant: every doc's words are wrapped into an HTML page with
# head/style/script chrome, a nav div, a short line, a javascript line, an
# unpunctuated boilerplate line, and 1-3 real sentences gated on doc length
# (n>=10 always / n>=20 / n>=35), plus page-killing brace (doc_id%17) and
# lorem-ipsum (doc_id%23) plants — so every line rule and page rule
# separates docs observably at all three scales.

_BRACE_LINE = "<p>var config = { mode: production, debug: false };.</p>"
_LOREM_LINE = "<p>lorem ipsum dolor sit amet consectetur adipiscing.</p>"


@register(
    "text_html_strip_c4",
    oracle=f"""
    WITH w0 AS (
        SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS w FROM documents
    ),
    page AS (
        SELECT doc_id,
          '<html><head><title>Doc ' || doc_id
          || '</title><style>.m{{color:#fff}}</style>'
          || '<script type="text/javascript">var a=1;</script></head><body>'
          || '<div class="nav">Home | About | Contact</div>'
          || '<p>' || ARRAY_TO_STRING(LIST_SLICE(w, 1, 8), ' ') || '.</p>'
          || '<p>' || ARRAY_TO_STRING(LIST_SLICE(w, 1, 2), ' ') || '.</p>'
          || '<p>Please enable javascript to view this page.</p>'
          || CASE WHEN LEN(w) >= 20
                  THEN '<p>' || ARRAY_TO_STRING(LIST_SLICE(w, 9, 20), ' ') || '?</p>'
                  ELSE '' END
          || CASE WHEN LEN(w) >= 35
                  THEN '<p>' || ARRAY_TO_STRING(LIST_SLICE(w, 21, 32), ' ') || '!</p>'
                  ELSE '' END
          || '<p>copyright terms cookie policy settings menu</p>'
          || CASE WHEN doc_id % 17 = 0 THEN '{_BRACE_LINE}' ELSE '' END
          || CASE WHEN doc_id % 23 = 0 THEN '{_LOREM_LINE}' ELSE '' END
          || '</body></html>' AS html
        FROM w0
    ),
    stripped AS (
        SELECT doc_id,
          STRING_SPLIT(
            REGEXP_REPLACE(
              REGEXP_REPLACE(
                REGEXP_REPLACE(
                  REGEXP_REPLACE(html, '<script[^>]*>.*?</script>', ' ', 'g'),
                  '<style[^>]*>.*?</style>', ' ', 'g'),
                '</p>|</div>|</title>', CHR(10), 'g'),
              '<[^>]*>', ' ', 'g'),
            CHR(10)) AS rawlines
        FROM page
    ),
    lined AS (
        SELECT doc_id,
          LIST_FILTER(
            LIST_TRANSFORM(rawlines, x -> TRIM(REGEXP_REPLACE(x, '\\s+', ' ', 'g'))),
            x -> x <> '') AS nl
        FROM stripped
    ),
    keptl AS (
        SELECT doc_id, nl,
          LIST_FILTER(nl, x ->
              REGEXP_MATCHES(x, '[.!?"]$')
              AND LEN(STRING_SPLIT(x, ' ')) >= {MIN_LINE_WORDS}
              AND NOT CONTAINS(LOWER(x), 'javascript')) AS kept
        FROM lined
    )
    SELECT doc_id,
           CAST(LEN(nl) AS BIGINT) AS n_lines_raw,
           CAST(LEN(kept) AS BIGINT) AS n_lines_kept,
           COALESCE(ARRAY_TO_STRING(kept, CHR(10)), '') AS clean_text,
           (LEN(kept) >= {MIN_PAGE_LINES}
            AND NOT CONTAINS(COALESCE(ARRAY_TO_STRING(kept, CHR(10)), ''), '{{')
            AND NOT CONTAINS(LOWER(COALESCE(ARRAY_TO_STRING(kept, CHR(10)), '')),
                             'lorem ipsum')) AS page_kept
    FROM keptl
    """,
)
def text_html_strip_c4(spark, sf_dir):
    """C4-style HTML/boilerplate stripping (Raffel et al. 2020 §2.2) — the
    crawl front-end stage that feeds every downstream dedup/quality/token
    stage: drop script/style subtrees, strip tags, split on block-closing
    tags, then keep only lines that end in terminal punctuation, carry >=
    {MIN_LINE_WORDS} words, and don't mention 'javascript'; keep only pages
    with >= {MIN_PAGE_LINES} surviving sentences and no curly-brace / lorem
    ipsum text.  Emits per-doc raw/kept line counts, the cleansed text, and
    the page gate flag.

    Scale shape: ONE map-side codegen'd projection (regexes + array HOFs) —
    no shuffle, no Python; the guarded spread_scan only spreads the
    single-row-group local fixture and adds no exchange on a real multi-
    split scan.  The oracle independently re-implements the rules with
    DuckDB string/list functions over the identical planted pages."""
    d = load_table(spark, sf_dir, "documents")
    base = spread_scan(d.select("doc_id", "text"), "doc_id")
    w = F.split(F.trim(F.col("text")), r"\s+")
    n = F.size(w)

    def sent(start: int, length: int, punct: str):
        return F.concat(
            F.lit("<p>"),
            F.concat_ws(" ", F.slice(w, start, length)),
            F.lit(punct + "</p>"),
        )

    html = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit(
            "</title><style>.m{color:#fff}</style>"
            '<script type="text/javascript">var a=1;</script></head><body>'
        ),
        F.lit('<div class="nav">Home | About | Contact</div>'),
        sent(1, 8, "."),
        sent(1, 2, "."),
        F.lit("<p>Please enable javascript to view this page.</p>"),
        F.when(n >= 20, sent(9, 12, "?")).otherwise(F.lit("")),
        F.when(n >= 35, sent(21, 12, "!")).otherwise(F.lit("")),
        F.lit("<p>copyright terms cookie policy settings menu</p>"),
        F.when(F.col("doc_id") % 17 == 0, F.lit(_BRACE_LINE)).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 23 == 0, F.lit(_LOREM_LINE)).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    staged = (
        base.select("doc_id", html.alias("html"))
        .select("doc_id", visible_lines(F.col("html")).alias("nl"))
        .select("doc_id", "nl", c4_kept_lines(F.col("nl")).alias("kept"))
    )
    clean = F.concat_ws("\n", F.col("kept"))
    return staged.select(
        "doc_id",
        F.size("nl").cast("long").alias("n_lines_raw"),
        F.size("kept").cast("long").alias("n_lines_kept"),
        clean.alias("clean_text"),
        c4_page_kept(F.col("kept"), clean).alias("page_kept"),
    )


if text_html_strip_c4.__doc__:  # None under python -OO
    text_html_strip_c4.__doc__ = (
        text_html_strip_c4.__doc__
        .replace("{MIN_LINE_WORDS}", str(MIN_LINE_WORDS))
        .replace("{MIN_PAGE_LINES}", str(MIN_PAGE_LINES))
    )
