"""Text-analysis operators for large-scale training-data pipelines:
tokenization, quality scoring, language ID, fingerprinting.

All hot-path logic is native Spark expressions (whole-stage codegen,
no Python in the loop); the only shuffles are the final aggregates.
At 100 TB these run as embarrassingly-parallel scans.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny embedded stopword list (public, language-agnostic English core).
STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it"]

# Marker words for the n-gram-style language-ID heuristic. The testbed
# corpus is synthetic word soup, so markers are drawn from its vocab;
# for real corpora this would be per-language character n-gram tables.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a"],
    "de": ["der", "und"],
    "fr": ["le", "et"],
    "es": ["el", "y"],
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization with blank-drop (reference R5/R6
    semantics: split -> trim -> drop empties)."""
    return F.filter(F.split(text, r"\s+"), lambda x: x != "")


def bpe_ish_tokens(text: Column | str) -> Column:
    """BPE-ish sub-word segmentation: runs of letters, runs of digits,
    or single non-space symbols — the standard pre-tokenizer regex."""
    return F.regexp_extract_all(text, F.lit(r"([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s])"), 1)


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def stopword_ratio(text: Column | str) -> Column:
    toks = tokens(text)
    n_stop = F.size(F.filter(toks, lambda x: F.lower(x).isin(*STOPWORDS)))
    return n_stop / F.greatest(F.size(toks), F.lit(1))


def alpha_ratio(text: Column | str) -> Column:
    """Fraction of characters that are ASCII letters or space."""
    clean = F.regexp_replace(text, r"[^a-zA-Z ]", "")
    return F.length(clean) / F.greatest(F.length(text), F.lit(1))


def quality_score(text: Column | str) -> Column:
    """Composite doc-quality heuristic in [0, 1]: balanced length,
    some stopwords, mostly alphabetic — the usual pretraining filters."""
    len_score = F.least(F.length(text) / F.lit(500.0), F.lit(1.0))
    return F.round(
        0.4 * len_score + 0.3 * stopword_ratio(text) + 0.3 * alpha_ratio(text), 4
    )


def lang_guess(text: Column | str) -> Column:
    """Marker-word language ID; 'und' (undetermined) when no marker
    hits. First matching language in fixed order wins (deterministic)."""
    toks = tokens(text)
    out = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):
        hit = F.arrays_overlap(toks, F.array(*[F.lit(m) for m in LANG_MARKERS[lang]]))
        out = F.when(hit, F.lit(lang)).otherwise(out)
    return out


def normalize_text(text: Column | str) -> Column:
    """Dedup normalization: lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint_sha256(text: Column | str) -> Column:
    return F.sha2(normalize_text(text), 256)


def fingerprint_md5(text: Column | str) -> Column:
    return F.md5(normalize_text(text))


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Word-level n-gram shingles as an array of 'w1 w2 w3' strings.
    Pure array lambdas — no explode, no Python. The token array is
    bind-bound: referenced bare inside the transform lambda it would
    be re-split once PER SHINGLE (O(len²) per doc — see expr.bind)."""
    from sparkclif.operators.expr import bind

    return bind(
        tokens(text),
        lambda t: F.transform(
            F.when(
                F.size(t) - (n - 1) >= 1, F.sequence(F.lit(1), F.size(t) - (n - 1))
            ).otherwise(F.array().cast("array<int>")),
            lambda i: F.array_join(F.slice(t, i, n), " "),
        ),
    )


def top_token_count(text: Column | str) -> Column:
    """Count of the single most frequent token (0 for empty docs) —
    the numerator of the Gopher-style top-token repetition fraction
    (Rae et al. 2021 §A1.1: docs where one token dominates are
    boilerplate/spam). Pure array lambdas, O(distinct × tokens) per
    row, no shuffle, no Python — at 100 TB this is scan-side work.
    The token array is bind-bound (else it is re-split once per
    distinct token — O(distinct × len) splits; see expr.bind)."""
    from sparkclif.operators.expr import bind

    return bind(
        tokens(text),
        lambda t: F.coalesce(
            F.array_max(
                F.transform(
                    F.array_distinct(t),
                    lambda tk: F.size(F.filter(t, lambda x: x == tk)),
                )
            ),
            F.lit(0),
        ),
    ).cast("long")


ROLLING_MOD = 1_000_000_007
ROLLING_BASE = 31


def rolling_hash(text: Column | str) -> Column:
    """Polynomial rolling hash (Rabin-Karp style) over character codes:
    h = fold(h * 31 + code) mod 1e9+7. Pure JVM expressions; the char
    list never leaves the executor. Cross-engine deterministic (same
    fold is expressible as DuckDB list_reduce), unlike md5/sha only in
    that it supports incremental/windowed extension at scale."""
    codes = F.transform(
        F.sequence(F.lit(1), F.length(text)),
        lambda i: F.ascii(F.substring(text, i, F.lit(1))),
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * ROLLING_BASE + c) % ROLLING_MOD,
    )


# PII patterns — deliberately simple, engine-portable (identical
# semantics under Java regex and RE2): emails, NNN-NNN-NNNN phones,
# dotted-quad IPs. Scrubbing applies them IN ORDER (emails first, so a
# phone/IP never matches inside an already-redacted address).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def pii_count(text: Column | str, pattern: str) -> Column:
    """Occurrences of one PII pattern (whole-match group)."""
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0))


def pii_scrub(text: Column | str) -> Column:
    """Redact every PII pattern, in declaration order. Pure JVM
    regexp_replace chain — no Python in the scrub path."""
    out = F.col(text) if isinstance(text, str) else text
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out
