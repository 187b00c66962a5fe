"""Text-analysis column functions (north-star surface, SURVEY.md §2B).

Everything here is a pure JVM-side column expression — no Python UDFs —
so the whole text pipeline stays inside whole-stage codegen and
vectorized execution at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# minimal per-language stopword lists for the n-gram/stopword lang-id
# heuristic; deliberately tiny — the heuristic's shape (argmax over
# per-language hit ratios) is the operator, the lists are config.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von"),
    "fr": ("le", "la", "de", "et", "est", "un", "une", "que", "pour", "dans"),
    "fi": ("ja", "on", "ei", "se", "että", "oli", "hän", "mutta", "niin", "kuin"),
    "sv": ("och", "att", "det", "som", "en", "är", "av", "för", "med", "på"),
}


def tokenize(text: Column | str, lowercase: bool = True) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    if lowercase:
        c = F.lower(c)
    return F.split(F.trim(c), r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokenize(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """Sub-word-ish token count: splits on whitespace AND on
    letter/digit/punctuation boundaries (a cheap BPE proxy — counts the
    segments a byte-pair tokenizer would not merge across)."""
    c = F.col(text) if isinstance(text, str) else text
    pieces = F.split(
        F.regexp_replace(c, r"([0-9]+|[^\sA-Za-z0-9]+)", r" $1 "), r"\s+"
    )
    return F.size(F.filter(pieces, lambda p: p != ""))


def shingles(tokens: Column, n: int = 3) -> Column:
    """Distinct n-token shingles of a token array (order-preserving
    join with single spaces). Empty array when the doc is shorter than
    ``n`` tokens.

    Built from n shifted slices zipped together — O(n) array copies per
    document.  (The obvious transform(sequence(...), i -> slice(toks,
    i, n)) is O(len²): one slice allocation per position.)
    """
    length = F.size(tokens) - (n - 1)
    parts = [F.slice(tokens, F.lit(k + 1), length) for k in range(n)]
    joined = parts[0]
    for p in parts[1:]:
        joined = F.zip_with(joined, p, lambda x, y: F.concat(x, F.lit(" "), y))
    return F.array_distinct(
        F.when(F.size(tokens) >= n, joined).otherwise(F.array().cast("array<string>"))
    )


def stopword_hits(tokens: Column, lang: str) -> Column:
    return F.size(F.array_intersect(tokens, F.array(*[F.lit(w) for w in STOPWORDS[lang]])))


def stopword_ratio(tokens: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang`` (counting
    multiplicity)."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(tokens, lambda t: F.array_contains(sw, t)))
    return hits / F.nullif(F.size(tokens), F.lit(0))


def lang_id(tokens: Column) -> Column:
    """Heuristic language id: argmax over per-language stopword hit
    counts; ``und`` (undetermined) when no list scores > 0.  Pure column
    expression — the argmax is a greatest-of-structs trick."""
    scored = [
        F.struct(stopword_hits(tokens, lang).alias("score"), F.lit(lang).alias("lang"))
        for lang in sorted(STOPWORDS)  # sorted => deterministic tie-break (max lang wins)
    ]
    best = F.greatest(*scored)
    return F.when(best.getField("score") > 0, best.getField("lang")).otherwise(
        F.lit("und")
    )


def quality_score(text: Column | str) -> Column:
    """Composite document-quality heuristic in [0, 1]: length band,
    alpha ratio, mean word length band, stopword presence.  The exact
    weights are config; the operator is the all-columnar composition."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokenize(c)
    n_tok = F.size(toks)
    n_chars = F.length(c)
    alpha_ratio = (
        F.length(F.regexp_replace(c, r"[^A-Za-zÀ-ÿ]", "")) / F.nullif(n_chars, F.lit(0))
    )
    mean_wlen = n_chars / F.nullif(n_tok, F.lit(0))
    len_band = F.when((n_tok >= 10) & (n_tok <= 10000), 1.0).otherwise(0.25)
    wlen_band = F.when((mean_wlen >= 2.5) & (mean_wlen <= 12.0), 1.0).otherwise(0.25)
    sw = stopword_ratio(toks)
    sw_band = F.when(sw > 0.01, 1.0).otherwise(0.5)
    return F.round(
        0.3 * len_band + 0.3 * F.coalesce(alpha_ratio, F.lit(0.0)) + 0.2 * wlen_band + 0.2 * sw_band,
        6,
    )


def fingerprint(text: Column | str, algo: str = "md5") -> Column:
    """Deterministic document fingerprint of the raw text bytes — the
    payload-digest analog of Deduplicator.java:27-28,46 for documents.
    ``md5``/``sha256`` hex (externalizable, like the reference's
    Redis-ready murmur3_128(42)); ``xxhash64`` for cheap in-plan use."""
    c = F.col(text) if isinstance(text, str) else text
    if algo == "md5":
        return F.md5(c.cast("binary"))
    if algo == "sha256":
        return F.sha2(c.cast("binary"), 256)
    if algo == "xxhash64":
        return F.xxhash64(c)
    raise ValueError(f"unknown fingerprint algo {algo!r}")


# PII patterns restricted to syntax RE2 (DuckDB) and java.util.regex
# (Spark) interpret IDENTICALLY — no backrefs, no lookaround, no
# engine-specific classes — so the scrub stays oracle-checkable.
PII_URL = r"https?://[^\s]+"
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_INTL_PHONE = r"\+[0-9]{7,14}"


def scrub_pii(
    text: Column | str,
    url_token: str = "<URL>",
    email_token: str = "<EMAIL>",
    phone_token: str = "<PHONE>",
) -> Column:
    """Training-corpus PII scrub: URLs, emails, and international-form
    phone numbers become placeholder tokens.  Pure JVM regexp_replace
    chain — whole-stage codegen, no Python.  URL first (an email-shaped
    substring inside a URL must scrub as part of the URL, not split
    it), then email, then phone."""
    c = F.col(text) if isinstance(text, str) else text
    c = F.regexp_replace(c, PII_URL, url_token)
    c = F.regexp_replace(c, PII_EMAIL, email_token)
    c = F.regexp_replace(c, PII_INTL_PHONE, phone_token)
    return c


def chunk_text(
    text: Column | str, size: int = 200, stride: int = 150
) -> Column:
    """Overlapping fixed-width character chunks (the LLM-training
    document-splitting primitive): chunk i covers
    ``[i*stride, i*stride + size)``; a doc of length <= size is one
    chunk.  Array-returning column expression — pair with
    ``posexplode`` for (chunk_idx, chunk) rows.  O(n_chunks) substring
    copies per doc, all inside codegen."""
    c = F.col(text) if isinstance(text, str) else text
    n_chunks = F.when(F.length(c) <= size, F.lit(1)).otherwise(
        F.ceil((F.length(c) - F.lit(size)) / F.lit(float(stride))).cast("long")
        + 1
    )
    return F.transform(
        F.sequence(F.lit(0), (n_chunks - 1).cast("int")),
        lambda i: c.substr(i * stride + 1, F.lit(size)),
    )


def hash64(col: Column, seed: int | Column = 0) -> Column:
    """Deterministic 60-bit positive hash derived from md5 — chosen over
    xxhash64 because BOTH Spark and DuckDB can compute it, so
    hash-keyed operators (minhash) stay oracle-checkable.  15 hex chars
    = 60 bits, always positive, fits BIGINT."""
    seed_c = F.lit(seed) if isinstance(seed, int) else seed
    hexpart = F.substring(
        F.md5(F.concat_ws("|", seed_c.cast("string"), col).cast("binary")), 1, 15
    )
    return F.conv(hexpart, 16, 10).cast("bigint")
