"""Shared text-expression builders used by the text-analysis and dedup
operators. Everything here is a plain Catalyst column expression (JVM-side,
codegen'd) — no Python UDFs in any hot path.

Cross-engine notes (these expressions are oracle-compared against DuckDB):
- ``split(text, ' ')`` and DuckDB ``string_split`` agree on single-space
  word-salad input (verified, including empty-token behavior);
- occurrence counting uses the replace-length trick, which both engines
  implement as non-overlapping left-to-right replacement;
- word shingles via ``sequence``+``slice``+``array_join`` agree with
  DuckDB list slicing ``ws[i:i+2]`` including the short-tail behavior.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def words_col(text: Column | str = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count(text: Column | str = "text") -> Column:
    """Whitespace token count, as BIGINT (DuckDB len() width)."""
    return F.size(words_col(text)).cast("long")


def occurrences(text: Column, needle: str) -> Column:
    """Non-overlapping occurrence count of ``needle`` in ``text``."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def sql_occurrences(text_expr: str, needle: str) -> str:
    """DuckDB twin of :func:`occurrences` (needle must be quote-safe)."""
    return (
        f"CAST((LENGTH({text_expr}) - LENGTH(REPLACE({text_expr}, '{needle}', '')))"
        f" / {len(needle)} AS BIGINT)"
    )


def shingles_expr(words: str = "ws", n: int = 3) -> Column:
    """Word n-gram shingles of the array column ``words`` (default 3-grams).

    Short documents (< n words) produce one truncated shingle, matching
    DuckDB's permissive list slicing.
    """
    return F.expr(
        f"transform(sequence(1, greatest(size({words}) - {n - 1}, 1)),"
        f" i -> array_join(slice({words}, i, {n}), ' '))"
    )


#: Every ASCII char the canonical form deletes (controls, punctuation,
#: uppercase — the latter only defensively, lower() runs first).
_ASCII_JUNK = "".join(
    chr(i)
    for i in range(1, 128)
    if not ("a" <= chr(i) <= "z" or "0" <= chr(i) <= "9" or chr(i) == " ")
)

#: Every char the canonical form KEEPS — deleting these leaves exactly the
#: junk, which is how junk is detected without a regex scan.
_KEPT = "abcdefghijklmnopqrstuvwxyz0123456789 "


def normalized_text(text: Column | str = "text") -> Column:
    """Canonical form for fingerprinting: lowercase, strip non-alnum (keep
    spaces), collapse runs of spaces, trim.

    Cost engineering — this chain dominates the fingerprint scan at scale,
    and the obvious ``regexp_replace(c, '[^a-z0-9 ]+', '')`` turned out to
    be the single worst expression in the whole engine: any full-string
    Java-regex scan with that negated class — replaceAll, or even a
    never-matching ``rlike`` probe — runs ~50 us/doc AND anti-scales
    across executor threads (measured at sf10, 500 k docs: 12 s on
    local[1] -> 23.7 s on local[32]; GC choice irrelevant). Patterns that
    match early (``' {2,}'``) are unaffected. So the chain avoids regex
    everywhere the input allows:

    - ASCII junk — all of it, in every realistic corpus — is deleted by
      ``translate`` (a table lookup: 0.5 s for the same scan, scales);
    - residual non-ASCII junk is DETECTED by a second translate (delete
      the kept alphabet; anything left is junk) rather than a regex probe;
    - only rows that still carry junk pay the regex, i.e. none on an
      ASCII corpus.

    Byte-identical output to the pure-regex form on any input."""
    c = F.col(text) if isinstance(text, str) else text
    c = F.lower(c)
    c = F.translate(c, _ASCII_JUNK, "")
    c = F.when(
        F.length(F.translate(c, _KEPT, "")) > 0,
        F.regexp_replace(c, "[^a-z0-9 ]+", ""),
    ).otherwise(c)
    c = F.regexp_replace(c, " {2,}", " ")
    return F.trim(c)


SQL_NORMALIZED_TEXT = (
    "TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER({t}), '[^a-z0-9 ]+', '', 'g'),"
    " ' {{2,}}', ' ', 'g'))"
)


#: Tiny per-language stopword marker sets for the heuristic language ID.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "es": [" el ", " la ", " que "],
    "fr": [" le ", " les ", " des "],
    "de": [" der ", " die ", " und "],
}


def quality_score_col() -> Column:
    """The composite document quality score (length saturation +
    digit-density penalty, each weighted 0.5) over the ``text`` column —
    the ONE definition shared by text_quality_score, the curation funnel,
    and the cluster-representative picker (:data:`SQL_QUALITY_SCORE` is
    the DuckDB twin).

    translate, not regexp_replace('[0-9]'): a char-class replaceAll is a
    full-string Java-regex scan, which anti-scales across executor threads
    (see :func:`normalized_text`); the translate table lookup is
    equivalent and linear."""
    n_tokens = token_count()
    n_chars = F.length("text").cast("long")
    n_digits = (
        F.length("text") - F.length(F.translate("text", "0123456789", ""))
    ).cast("long")
    digit_ratio = n_digits / F.greatest(n_chars, F.lit(1)).cast("double")
    return 0.5 * F.least(n_tokens / 50.0, F.lit(1.0)) + 0.5 * (
        1.0 - digit_ratio
    )


#: DuckDB twin of :func:`quality_score_col` ({t} = the text expression).
SQL_QUALITY_SCORE = (
    "(0.5 * LEAST(CAST(LEN(STRING_SPLIT({t}, ' ')) AS BIGINT) / 50.0, 1.0)"
    " + 0.5 * (1.0 - (LENGTH({t}) - LENGTH(REGEXP_REPLACE({t}, '[0-9]', '', 'g')))"
    " / CAST(GREATEST(LENGTH({t}), 1) AS DOUBLE)))"
)
