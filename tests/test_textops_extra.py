"""Crafted-input tests for the round-3 text-curation operators: PII scrubbing
(the fixture corpus contains no PII-shaped strings, so redaction behavior
needs synthetic documents) and repetition metrics (a known-spammy document
must trip the keep=false flag)."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_cms_inpatient_etl_spark.operators.scrub import (
    PII_PATTERNS,
    denylist_pattern,
    scrub_counts,
    scrub_text,
)


def _scrub_one(spark, text: str, patterns=PII_PATTERNS):
    df = spark.createDataFrame([(text,)], "text string")
    counts = scrub_counts(F.col("text"), patterns)
    row = df.select(
        scrub_text(F.col("text"), patterns).alias("clean"),
        *[c.alias(n) for n, c in counts.items()],
    ).first()
    return row.clean, {n: row[n] for n, _, _ in patterns}


def test_pii_scrub_redacts_all_default_patterns(spark):
    text = (
        "mail alice.smith+spam@example.co.uk or call 555-867-5309, "
        "ssn 123-45-6789, host 192.168.0.1 end"
    )
    clean, counts = _scrub_one(spark, text)
    assert clean == (
        "mail [EMAIL] or call [PHONE], ssn [SSN], host [IP] end"
    )
    assert counts == {"email": 1, "ssn": 1, "phone": 1, "ipv4": 1}


def test_pii_scrub_patterns_are_disjoint_on_overlapping_shapes(spark):
    # dotted phone has 2 dots (not an IPv4), SSN grouping 3-2-4 differs from
    # phone 3-3-4 — each string matches exactly one pattern
    clean, counts = _scrub_one(spark, "123.456.7890 and 10.0.0.255 and 111-22-3333")
    assert clean == "[PHONE] and [IP] and [SSN]"
    assert sum(counts.values()) == 3


def test_pii_scrub_leaves_clean_text_untouched(spark):
    text = "ordinary prose with a version 1.2 release and room 101"
    clean, counts = _scrub_one(spark, text)
    assert clean == text
    assert sum(counts.values()) == 0


def test_denylist_is_whole_word_only(spark):
    pats = [("denylist", denylist_pattern(["secret", "internal"]), "[TERM]")]
    df = spark.createDataFrame(
        [("the secret internal secretly internals doc",)], "text string"
    )
    row = df.select(scrub_text(F.col("text"), pats).alias("clean")).first()
    # 'secretly' / 'internals' survive: \b guards both ends
    assert row.clean == "the [TERM] [TERM] secretly internals doc"


def test_repetition_metrics_flag_spammy_doc(spark, tmp_path):
    """A boilerplate-spam doc (one phrase looped) must get keep=false; a
    diverse doc with the same length must get keep=true."""
    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY

    spam = "buy now " * 30  # top-token frac 0.5, dup-bigram frac ~1.0
    diverse = " ".join(f"tok{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(0, spam.strip(), "en", "s0", len(spam)), (1, diverse, "en", "s1", len(diverse))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {
        r.doc_id: r
        for r in QUERY_REGISTRY["text_repetition_metrics"].fn(spark, str(tmp_path)).collect()
    }
    assert out[0].keep is False and out[0].top_token_frac >= 0.4
    assert out[1].keep is True and out[1].dup_bigram_frac == 0.0


def test_pii_scrub_chain_is_idempotent(spark):
    """Scrubbing already-scrubbed text is a no-op (replacements introduce no
    characters any pattern can match), and scrubbed text carries zero
    residual PII matches — the property that makes re-running the redaction
    stage over a partially-processed corpus safe.  Deterministic corpus:
    fixed-seed random strings over a PII-shaped alphabet plus crafted
    near-miss juxtapositions."""
    import random

    rng = random.Random(42)
    alphabet = "ab5. -@x0"
    rows = ["".join(rng.choice(alphabet) for _ in range(rng.randint(5, 60))) for _ in range(300)]
    rows += [
        "12alice@b.co3-45-6789",        # replacement juxtaposes digit runs
        "555-867-al@b.co5309",
        "prefix10.0.0.1suffix 999-99-9999",
        "a@b.cc a@b.cc a@b.cc",          # repeated matches
    ]
    df = spark.createDataFrame([(t,) for t in rows], "text string")
    pats = PII_PATTERNS
    once = scrub_text(F.col("text"), pats)
    twice = scrub_text(once, pats)
    residual = None
    for _, pat, _ in pats:
        c = F.regexp_count(once, F.lit(pat))
        residual = c if residual is None else residual + c
    bad = df.select(
        F.col("text"),
        once.alias("once"),
        twice.alias("twice"),
        residual.alias("residual"),
    ).filter((F.col("once") != F.col("twice")) | (F.col("residual") > 0))
    assert bad.count() == 0, bad.limit(5).collect()


def test_denylist_escapes_regex_metacharacters(spark):
    """Round-3 advice: terms with regex metacharacters must match literally —
    'c++' is not 'c' + quantifier, 'a.b' does not match 'axb' — and terms with
    non-word edges drop the \\b anchor on that side instead of inverting it."""
    pats = [("denylist", denylist_pattern(["c++", "a.b", "plain"]), "[TERM]")]
    df = spark.createDataFrame(
        [("we write c++ here, axb stays, a.b goes, ccc stays, plain goes",)],
        "text string",
    )
    row = df.select(scrub_text(F.col("text"), pats).alias("clean")).first()
    assert row.clean == "we write [TERM] here, axb stays, [TERM] goes, ccc stays, [TERM] goes"

    # word-edged terms still refuse substring matches after the rewrite
    pats2 = [("denylist", denylist_pattern(["plain"]), "[TERM]")]
    row2 = (
        spark.createDataFrame([("explained plain plains",)], "text string")
        .select(scrub_text(F.col("text"), pats2).alias("clean"))
        .first()
    )
    assert row2.clean == "explained [TERM] plains"
