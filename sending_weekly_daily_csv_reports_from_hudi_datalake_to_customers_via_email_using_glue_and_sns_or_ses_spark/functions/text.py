"""Text-cleaning column expressions for training-data pipelines —
PII scrubbing, repetition scoring, boilerplate stripping. All JVM-side
regex/array built-ins (codegen), no UDFs: a 100 TB cleaning sweep stays
one embarrassingly-parallel scan, composable with the quality gates in
operators/textual.py.

Patterns are the standard public shapes (emails, E.164-ish phones,
IPv4, SSN-form ids, URLs); the operator is the scrub machinery, not the
lexicon — production swaps in its own pattern set.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (pattern, replacement token) — applied in order, most specific
#: first: IP before PHONE so a dotted quad is claimed as <IP>, never
#: half-eaten by the looser phone shape. The phone shape itself is
#: anchored to digit-grouped forms (optional +CC, then 3-3-4 with
#: ()/space/./- separators) so dates and timestamps don't match.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"https?://[^\s]+", "<URL>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (
        r"(?<![\d.])(?:\+\d{1,2}[\s.-]?)?\(?\d{3}\)?[\s.-]?\d{3}[\s.-]?\d{4}(?!\.?\d)",
        "<PHONE>",
    ),
)


def scrub_pii(col: Column | str) -> Column:
    """Replace common PII shapes with typed placeholder tokens —
    the redaction pass before a corpus leaves its trust boundary."""
    out = F.col(col) if isinstance(col, str) else col
    for pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_hit_count(col: Column | str) -> Column:
    """How many PII-shaped substrings a document contains (the audit
    metric that decides whether scrubbing is worth a rewrite pass).

    Counts on the progressively-scrubbed text — the same sequence
    ``scrub_pii`` applies — so a substring is attributed to exactly one
    class (an SSN is not re-counted by the phone shape). NULL text
    counts 0 (``size`` of a null array is -1/-NULL, never what an
    audit sum wants)."""
    c = F.col(col) if isinstance(col, str) else col
    total = F.lit(0)
    scrubbed = c
    for pattern, token in PII_PATTERNS:
        total = total + F.size(F.regexp_extract_all(scrubbed, F.lit(pattern), 0))
        scrubbed = F.regexp_replace(scrubbed, pattern, token)
    return F.when(c.isNull(), F.lit(0)).otherwise(total)


def repetition_ratio(col: Column | str) -> Column:
    """1 − (distinct tokens / tokens): 0 for no repetition, → 1 for
    degenerate repeated text — the cheap loop/boilerplate quality signal
    (high repetition is the classic low-quality-document marker)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.lower(F.trim(c)), r"\s+")
    n = F.size(toks)
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(toks)) / n
    )


#: GPT-2-style pre-tokenizer shape (public pattern family): contraction
#: suffixes, space-prefixed letter runs, space-prefixed digit runs,
#: space-prefixed punctuation runs, residual whitespace. Java regex
#: (\p{L}/\p{N} classes) — JVM-side, codegen, no UDF.
BPE_TOKEN_RE = r"'(?:s|d|m|t|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def regex_token_count(col: Column | str) -> Column:
    """Token count under a BPE-ish pre-tokenizer regex — the budget
    estimator for sequence packing / cost accounting when the real
    tokenizer is out-of-process. Counts pre-token pieces (letter runs,
    digit runs, punctuation runs, contraction suffixes, residual
    whitespace runs — GPT-2 tokenizes those too); an actual BPE splits
    rare words further, so this is a LOWER bound — but far closer than
    whitespace counting, which misses punctuation entirely. NULL text
    counts 0 (``size`` of a null array is -1)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), 0))
    return F.when(c.isNull(), F.lit(0)).otherwise(n)


def duplicate_line_fraction(col: Column | str) -> Column:
    """Fraction of a document's lines that are repeats of another line
    (0 = all lines unique, → 1 for boilerplate walls) — the line-level
    Gopher-style repetition gate, as a pure array expression: split on
    newlines, 1 − distinct/total. Empty/NULL text scores 0 (the input
    is coalesced to '' here — without it, NULL text propagates through
    split/size, skips the n<=0 guard via NULL comparison, and the
    function returns NULL instead of its documented 0)."""
    c = F.col(col) if isinstance(col, str) else col
    lines = F.split(F.coalesce(c, F.lit("")), "\n")
    n = F.size(lines)
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(lines)) / n
    )


def strip_repeated_lines(col: Column | str) -> Column:
    """Drop consecutive duplicate lines (the cheap boilerplate/nav-menu
    strip): split on newlines, keep a line when it differs from its
    predecessor, rejoin. Pure array expressions — zip the line array
    with itself shifted by one."""
    c = F.col(col) if isinstance(col, str) else col
    lines = F.split(c, "\n")
    shifted = F.concat(F.array(F.lit(None).cast("string")), lines)
    kept = F.zip_with(
        lines,
        F.slice(shifted, 1, F.size(lines)),
        lambda cur, prev: F.when(
            prev.isNull() | (cur != prev), cur
        ),
    )
    return F.array_join(F.filter(kept, lambda x: x.isNotNull()), "\n")
