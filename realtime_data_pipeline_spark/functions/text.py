"""Text-analysis primitives for LLM-data pipelines (north-star surface).

All JVM-side built-ins / higher-order functions — no Python UDFs in the
hot path, so everything stays inside whole-stage codegen and scales
linearly with executors.  Integer arithmetic (token counts, rolling
hashes) is exact; double ratios are single divisions — both reproduce
bit-identically in DuckDB, which is how the oracle SQL checks them.

Cross-engine determinism contract (mirrored in plans/northstar.py):
  tokens      = split(trim(text), '\\s+')
  hash32(t)   = int(md5(t)[0:8], 16)          — via conv/hex-cast
  hash60(j,t) = int(md5(j || ':' || t)[0:15], 16)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lexicons for the language-ID heuristic.
# Alphabetical language order is the tie-break rule.
LANG_LEXICONS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "auf"),
    "en": ("the", "a", "and", "of", "to", "in", "is", "it", "for", "on"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "fr": ("le", "les", "et", "un", "est", "pour", "que", "dans", "sur", "pas"),
    "zh": ("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"),
}

FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_BASE = 31

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
BPE_REGEX = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def tokens(text_col: str = "text") -> Column:
    return F.split(F.trim(F.col(text_col)), r"\s+")


def token_count(text_col: str = "text") -> Column:
    """Whitespace token count."""
    return F.size(tokens(text_col))


def bpe_token_count(text_col: str = "text") -> Column:
    """Sub-word-ish token count via the BPE pre-tokenizer regex."""
    return F.regexp_count(F.col(text_col), F.lit(BPE_REGEX))


def stopword_hits(text_col: str, lexicon: tuple[str, ...]) -> Column:
    """Number of tokens (with multiplicity) found in `lexicon`."""
    lex = F.array(*[F.lit(w) for w in lexicon])
    return F.size(F.filter(tokens(text_col), lambda t: F.array_contains(lex, t)))


def char_class_ratio(text_col: str, char_class: str, ndigits: int = 4) -> Column:
    """Fraction of characters matching `char_class` (a regex class).
    Empty text yields NULL: under ANSI mode a bare division would
    THROW on length 0, and DuckDB's x/0 is NULL — the guard makes both
    engines agree (found by the hostile-value harness, r6)."""
    kept = F.length(F.regexp_replace(F.col(text_col), f"[^{char_class}]", ""))
    return F.when(
        F.length(F.col(text_col)) > 0,
        F.round(kept.cast("double") / F.length(F.col(text_col)), ndigits),
    )


def avg_token_len(text_col: str = "text", ndigits: int = 4) -> Column:
    total = F.aggregate(
        F.transform(tokens(text_col), F.length),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return F.round(total.cast("double") / F.size(tokens(text_col)), ndigits)


def stopword_ratio(text_col: str = "text", ndigits: int = 4) -> Column:
    all_stop = tuple(w for lex in LANG_LEXICONS.values() for w in lex)
    return F.round(
        stopword_hits(text_col, all_stop).cast("double") / F.size(tokens(text_col)),
        ndigits,
    )


def quality_score(text_col: str = "text", ndigits: int = 4) -> Column:
    """Deterministic heuristic quality score in [0,1]:
    0.4·min(n_tokens/100, 1) + 0.4·(1 − stopword_ratio) + 0.2·min(avg_len/8, 1).

    (Mirrors the shape of production quality filters — length prior,
    boilerplate penalty, vocabulary-richness proxy.)  Internals are
    UNROUNDED so the expression shape matches the SQL oracle exactly.
    """
    all_stop = tuple(w for lex in LANG_LEXICONS.values() for w in lex)
    n = token_count(text_col).cast("double")
    stop = stopword_hits(text_col, all_stop).cast("double")
    sumlen = F.aggregate(
        F.transform(tokens(text_col), F.length), F.lit(0), lambda a, x: a + x
    ).cast("double")
    return F.round(
        0.4 * F.least(n / 100.0, F.lit(1.0))
        + 0.4 * (1.0 - stop / n)
        + 0.2 * F.least((sumlen / n) / 8.0, F.lit(1.0)),
        ndigits,
    )


def language_scores(text_col: str = "text") -> list[Column]:
    """One hit-count column per language, alphabetical order."""
    return [
        stopword_hits(text_col, LANG_LEXICONS[lang]).alias(f"{lang}_hits")
        for lang in sorted(LANG_LEXICONS)
    ]


def predicted_lang_expr() -> Column:
    """Argmax over *_hits columns; ties go to the alphabetically first
    language (CASE evaluates in alphabetical order with >=)."""
    langs = sorted(LANG_LEXICONS)
    branches = []
    for i, lang in enumerate(langs[:-1]):
        rest = ", ".join(f"{l}_hits" for l in langs[i + 1 :])
        greatest = f"greatest({rest})" if "," in rest else rest
        branches.append(f"WHEN {lang}_hits >= {greatest} THEN '{lang}'")
    case = "CASE " + " ".join(branches) + f" ELSE '{langs[-1]}' END"
    return F.expr(case)


def doc_fingerprint(text_col: str = "text") -> Column:
    """Rolling polynomial hash over 32-bit token hashes:
    fp = fold(tokens, 0, (acc, h32(t)) -> (acc·31 + h32(t)) mod 1e9+7).

    Order-sensitive (unlike a bag-of-words hash) — two docs with the
    same words in different order fingerprint differently.
    """
    return F.expr(
        f"""aggregate(
              transform(split(trim({text_col}), '\\\\s+'),
                        t -> cast(conv(substr(md5(t), 1, 8), 16, 10) as bigint)),
              cast(0 as bigint),
              (acc, c) -> (acc * {FINGERPRINT_BASE} + c) % {FINGERPRINT_MOD})"""
    )


# --- PII detection / redaction ---------------------------------------------
#
# The standard pre-training scrub step: find and mask emails, phone-like
# number runs, and IPv4 literals before a corpus ships to training.
# Patterns are the conservative common subset of Java regex (Spark) and
# RE2-ish (DuckDB) dialects — character classes and bounded quantifiers
# only, no lookarounds — so the SAME pattern string drives both engines
# and the oracle is byte-exact.  Detection is all JVM built-ins
# (regexp_count / regexp_replace); no UDFs.

PII_PATTERNS: dict[str, str] = {
    # local@domain.tld — letters/digits/._%+- local part, dotted domain
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # 7+ digit runs allowing single spaces/dashes/dots between groups,
    # optional leading +country
    "phone": r"\+?[0-9]{2,4}([ .-]?[0-9]{2,4}){2,4}",
    # dotted-quad (over-matches 999.…; fine for a scrub step that
    # prefers recall)
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def pii_count(kind: str, text_col: str = "text") -> Column:
    """Occurrences of one PII pattern (0 on NULL text)."""
    return F.coalesce(
        F.regexp_count(F.col(text_col), F.lit(PII_PATTERNS[kind])),
        F.lit(0),
    ).cast("long")


def scrub_pii(text_col: str = "text") -> Column:
    """Masked text: each PII match replaced by its [KIND] tag.  Email
    first — an email contains dots+digits a phone/ip pattern could
    otherwise partially claim; ipv4 before phone so dotted quads don't
    decay into digit-run matches."""
    col = F.col(text_col)
    for kind in ("email", "ipv4", "phone"):
        col = F.regexp_replace(
            col, PII_PATTERNS[kind], f"[{kind.upper()}]"
        )
    return col
