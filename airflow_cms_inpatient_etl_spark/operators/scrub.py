"""Regex scrubbing for text corpora: PII redaction + configurable denylists.

A standard pre-training curation step (mirrors the redaction stage of public
pipelines such as CCNet/Dolma): emails, phone numbers, IPv4 addresses and
SSN-shaped strings are replaced with typed placeholder tokens before the text
reaches a tokenizer.  The operator is a pure column expression — a chain of
``regexp_replace`` calls executed JVM-side inside whole-stage codegen, so at
100 TB the scrub is a map-only pass with zero shuffle and zero Python.

Patterns are written in the common subset of Java regex (Spark) and RE2
(DuckDB) — character classes, bounded repetition, non-capturing groups and
``\\b`` word boundaries only — so the same pattern string drives both the
engine and the SQL oracle.  The default patterns are mutually disjoint (no
string matches two of them), which makes the per-pattern match counts on the
*original* text equal to the counts the sequential replacement chain would
consume — counting and replacing can therefore both be single-pass.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# (name, pattern, replacement) — pattern must be valid Java regex AND RE2.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "[PHONE]"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "[IP]"),
]


def denylist_pattern(terms: list[str]) -> str:
    """Whole-word alternation for a list of literal denylist terms.

    Terms are regex-escaped (``re.escape`` emits only backslash escapes of
    ASCII punctuation, which Java regex and RE2 both accept identically), so a
    term like ``c++`` or ``a.b`` matches literally instead of over-matching or
    breaking the pattern.  ``\\b`` only has its intended meaning next to a
    word character — before a term starting with ``+`` it would *invert* to
    "preceded by a word char" — so the anchor is applied per-edge only where
    the term's edge is a word character (RE2 has no lookaround, so the
    non-word edge is left unanchored rather than approximated).
    """
    if not terms:
        raise ValueError("denylist needs at least one term")
    parts = []
    for t in terms:
        lead = r"\b" if re.match(r"\w", t) else ""
        tail = r"\b" if re.search(r"\w$", t) else ""
        parts.append(lead + re.escape(t) + tail)
    return "(?:" + "|".join(parts) + ")"


def scrub_text(col: Column, patterns: list[tuple[str, str, str]]) -> Column:
    """Apply the replacement chain in order; returns the scrubbed column."""
    out = col
    for _, pat, rep in patterns:
        out = F.regexp_replace(out, pat, rep)
    return out


def scrub_counts(col: Column, patterns: list[tuple[str, str, str]]) -> dict[str, Column]:
    """Per-pattern match counts on the original text (patterns are disjoint,
    so original-text counts == matches consumed by the replacement chain)."""
    return {name: F.regexp_count(col, F.lit(pat)) for name, pat, _ in patterns}
