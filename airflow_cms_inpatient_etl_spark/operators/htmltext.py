"""C4-style HTML/boilerplate stripping — the pipeline FRONT-END stage: raw
markup -> visible text -> line-level cleanse -> page-level gate, per the C4
rules (Raffel et al. 2020, "Exploring the Limits of Transfer Learning...",
§2.2), before any dedup / quality / tokenizer stage sees the text.

Everything is built-in expressions (regexp_replace + array HOFs), so the
whole stage is ONE map-side codegen'd projection: no shuffle, no Python, and
at 100 TB it scales embarrassingly with the scan — the guarded spread_scan
in the query wrapper only matters for single-row-group local fixtures.

Rules (line level, applied to tag-stripped whitespace-collapsed lines):
  L1. keep only lines ending in a terminal punctuation mark (. ! ? ");
  L2. keep only lines with >= MIN_LINE_WORDS words;
  L3. drop any line containing the word 'javascript'.
Rules (page level, applied to the kept text):
  P1. drop pages with fewer than MIN_PAGE_LINES kept lines ("sentences");
  P2. drop pages whose kept text contains a curly brace (code);
  P3. drop pages whose kept text contains the phrase 'lorem ipsum'.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MIN_LINE_WORDS = 5
MIN_PAGE_LINES = 3
TERMINAL_PUNCT_RE = '[.!?"]$'

# block-closing tags that delimit visible-text lines once scripts/styles are
# gone; everything else collapses to inline whitespace
_LINE_BREAK_TAGS_RE = "</p>|</div>|</title>"


def visible_lines(html: Column) -> Column:
    """array<string>: trimmed, whitespace-collapsed, non-empty visible-text
    lines of an HTML page — script/style subtrees dropped, block-closing tags
    mapped to line breaks, every remaining tag stripped."""
    noscript = F.regexp_replace(html, "<script[^>]*>.*?</script>", " ")
    nostyle = F.regexp_replace(noscript, "<style[^>]*>.*?</style>", " ")
    lined = F.regexp_replace(nostyle, _LINE_BREAK_TAGS_RE, "\n")
    plain = F.regexp_replace(lined, "<[^>]*>", " ")
    norm = F.transform(
        F.split(plain, "\n"),
        lambda x: F.trim(F.regexp_replace(x, r"\s+", " ")),
    )
    return F.filter(norm, lambda x: x != F.lit(""))


def c4_kept_lines(lines: Column) -> Column:
    """array<string>: the lines surviving the C4 line rules L1-L3."""
    return F.filter(
        lines,
        lambda x: x.rlike(TERMINAL_PUNCT_RE)
        & (F.size(F.split(x, " ")) >= MIN_LINE_WORDS)
        & ~F.lower(x).contains("javascript"),
    )


def c4_page_kept(kept_lines: Column, clean_text: Column) -> Column:
    """boolean: the page survives the C4 page rules P1-P3."""
    return (
        (F.size(kept_lines) >= MIN_PAGE_LINES)
        & ~clean_text.contains("{")
        & ~F.lower(clean_text).contains("lorem ipsum")
    )
