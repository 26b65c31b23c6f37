"""Text-analysis column functions (training-data pipeline extensions).

The reference only touches text as an embedding input (reembed.py); a
100 TB training-data pipeline additionally needs language-ID, quality
scoring, token counting and fingerprinting. All of these are pure Catalyst
expressions (regexp + higher-order functions) — they run inside
whole-stage codegen at scan speed with zero shuffles, which is exactly what
you want when the input is 100 TB of raw text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WORD_RE = "[a-z]+"
# BPE-ish pre-tokenizer: letter runs | digit runs | punctuation runs
# (GPT-2-style pre-tokenization without the byte-level merges).
BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+"

# Tiny per-language marker-word profiles for the n-gram/stopword heuristic.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une"],
    "zh": ["de", "shi", "le", "zai", "you", "wo", "ta", "men"],
}
LANG_ORDER = list(_LANG_MARKERS)


def tokens(c: Column | str, pattern: str = WORD_RE) -> Column:
    """Lower-cased word tokens as array<string> (regexp-extract-all)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.regexp_extract_all(F.lower(c), F.lit(pattern), 0)


def token_count(c: Column | str, pattern: str = "\\S+") -> Column:
    """Whitespace token count; pass ``BPE_RE`` for the BPE-ish count."""
    c = F.col(c) if isinstance(c, str) else c
    return F.size(F.regexp_extract_all(c, F.lit(pattern), 0)).cast("bigint")


def char_ngrams(c: Column | str, n: int = 5) -> Column:
    """Character n-gram shingles (array<string>), empty for short strings.

    Built from ``sequence`` + ``transform`` + ``substring``. The short-input
    guard matters: Spark's ``sequence(1, 0)`` counts DOWN ([1, 0]), so
    without the ``when`` a too-short string would yield bogus shingles.
    """
    c = F.col(c) if isinstance(c, str) else c
    grams = F.transform(
        F.sequence(F.lit(1), F.length(c) - (n - 1)),
        lambda i: F.substring(c, i, n),
    )
    empty = F.array().cast("array<string>")
    return F.when(F.length(c) >= n, grams).otherwise(empty)


def word_shingles_from_tokens(toks: Column, k: int) -> Column:
    """k-word shingles from a token-array column (space-joined); empty when
    fewer than k tokens (guards Spark's descending ``sequence(1, 0)``)."""
    sh = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (k - 1)),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )
    empty = F.array().cast("array<string>")
    return F.when(F.size(toks) >= k, sh).otherwise(empty)


def word_shingles(c: Column | str, k: int = 5, pattern: str = WORD_RE) -> Column:
    """k-word shingles joined by a single space (array<string>)."""
    return word_shingles_from_tokens(tokens(c, pattern), k)


def distinct_word_shingles(c: Column | str, k: int = 3):
    """DISTINCT k-word shingles of the default word tokenization, as a
    vectorized pandas kernel (array<string>, set semantics — element
    order unspecified).

    Value-equal to ``array_distinct(word_shingles_from_tokens(tokens(c),
    k))`` up to element order (r12 A/B: identical exploded row sets on
    the sf0.1 documents corpus) — use it ONLY where consumers are
    set-semantic (explode+distinct, minhash-style list_min). The
    interpreted Catalyst HOF chain (regexp_extract_all + transform +
    slice + array_join + array_distinct) measured ~5× slower than one
    regex pass + a Python set per row in an Arrow batch — the same
    measured trade as :func:`kept_window_fingerprints` and
    ``operators.dedup``'s shingle kernels.
    """
    import re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    word_re = re.compile(WORD_RE)

    def _batch(texts):
        out = []
        for t in texts:
            toks = word_re.findall(t.lower()) if isinstance(t, str) else []
            out.append(
                list(
                    {
                        " ".join(toks[i : i + k])
                        for i in range(len(toks) - k + 1)
                    }
                )
                if len(toks) >= k
                else []
            )
        return pd.Series(out)

    udf = pandas_udf(_batch, ArrayType(StringType()))
    col = F.col(c) if isinstance(c, str) else c
    return udf(col)


def _marker_hits(toks: Column, markers: list[str]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(markers)))


def language_id(c: Column | str, pretokenized: bool = False) -> Column:
    """Marker-word language heuristic: score each language profile by
    marker-token hits (normalized by token count), argmax with a stable
    tie-break on profile order; no hits at all -> 'und' (undetermined).

    Deterministic and shuffle-free; for real corpora swap the marker lists
    for character-trigram profiles — same plan shape.

    ``pretokenized=True`` treats ``c`` as an already-computed token array —
    tokenize once in a prior projection when scoring many profiles (the
    regexp is the expensive part and is otherwise re-evaluated per profile).
    """
    toks = (F.col(c) if isinstance(c, str) else c) if pretokenized else tokens(c)
    # argmax with first-wins tie-break: array_max over (score, -index, lang)
    # structs compares lexicographically, so the winner is the highest
    # score and, among ties, the earliest profile. Each profile's
    # marker-hit expression appears exactly ONCE in the plan — a nested
    # CASE WHEN chain would embed the running best twice per level and
    # grow the expression tree 2^|profiles|.
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    _marker_hits(toks, m).alias("score"),
                    F.lit(-i).alias("neg_idx"),
                    F.lit(lang).alias("lang"),
                )
                for i, (lang, m) in enumerate(_LANG_MARKERS.items())
            ]
        )
    )
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_score(c: Column | str) -> Column:
    """Document-quality heuristics as a struct column:

    - n_chars, n_tokens, avg_token_len
    - punct_ratio: punctuation chars / chars
    - upper_ratio: uppercase chars / chars
    - stopword_ratio: english-marker tokens / tokens (emitted as its
      own field for C4-style thresholding; deliberately NOT folded into
      the composite — the marker list is a tiny English profile, and a
      multiplicative stopword term would zero out valid non-English
      text the language_id path is responsible for routing)
    - score: composite in [0,1] (length-normalized, penalizing extreme
      punctuation / uppercase) — the usual C4/Gopher style filters
      reduce to thresholds on these fields.
    """
    c = F.col(c) if isinstance(c, str) else c
    n_chars = F.length(c).cast("bigint")
    toks = tokens(c)
    n_tokens = F.size(toks).cast("bigint")
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    safe_tokens = F.greatest(n_tokens, F.lit(1)).cast("double")
    n_punct = F.length(F.regexp_replace(c, "[^!-/:-@\\[-`{-~]", ""))
    n_upper = F.length(F.regexp_replace(c, "[^A-Z]", ""))
    n_stop = _marker_hits(toks, _LANG_MARKERS["en"])
    punct_ratio = n_punct / safe_chars
    upper_ratio = n_upper / safe_chars
    stop_ratio = n_stop / safe_tokens
    avg_tok = n_chars / safe_tokens
    length_term = F.least(n_tokens.cast("double") / F.lit(100.0), F.lit(1.0))
    score = (
        length_term
        * (F.lit(1.0) - F.least(punct_ratio * 2, F.lit(1.0)))
        * (F.lit(1.0) - F.least(upper_ratio * 2, F.lit(1.0)))
    )
    return F.struct(
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(avg_tok, 4).alias("avg_token_len"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(upper_ratio, 4).alias("upper_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(score, 4).alias("score"),
    )


def doc_fingerprint(c: Column | str) -> Column:
    """Canonical content fingerprint: lowercase, strip all non-alphanumerics,
    md5. Whitespace/punctuation-insensitive exact-dup key — the first stage
    of every dedup pipeline (cheap, shuffle-on-16-bytes instead of on the
    full document).
    """
    c = F.col(c) if isinstance(c, str) else c
    return F.md5(F.regexp_replace(F.lower(c), "[^a-z0-9]", ""))


def rolling_fingerprints(c: Column | str, n: int = 8, keep_every: int = 4) -> Column:
    """Winnowing-style fingerprint set: md5 of every character n-gram,
    downsampled by hash suffix (keep hashes whose last hex nibble <
    16/keep_every). Returns a sorted array<string> usable as a
    containment-detection key set (explode + join on fingerprint to find
    overlapping documents). ~1/keep_every of n-grams survive, so the
    exploded size stays bounded at scale.
    """
    grams = char_ngrams(c, n)
    hashes = F.transform(grams, F.md5)
    thresh_digits = "0123456789abcdef"[: max(1, 16 // keep_every)]
    kept = F.filter(
        hashes, lambda h: F.substring(h, 32, 1).isin(list(thresh_digits))
    )
    return F.array_sort(F.array_distinct(kept))


# PII scrub patterns: portable across Java regex (Spark) and RE2 (DuckDB)
# — no backreferences, no lookaround.
PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_IPV4_RE = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"
PII_PHONE_RE = "\\+?\\d[\\d\\s().-]{6,}\\d"


def redact_pii(
    c: Column | str,
    email: bool = True,
    ipv4: bool = True,
    phone: bool = True,
) -> Column:
    """Replace emails / IPv4s / phone-shaped digit runs with typed
    placeholder tokens — the standard pre-training scrub pass.

    Order matters: emails first (their local part can look like a phone),
    then IPs (dotted digits would otherwise feed the phone pattern), then
    phones. Pure regexp_replace chain — codegen'd, zero shuffle, scan
    speed on raw text.
    """
    c = F.col(c) if isinstance(c, str) else c
    if email:
        c = F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>")
    if ipv4:
        c = F.regexp_replace(c, PII_IPV4_RE, "<IP>")
    if phone:
        c = F.regexp_replace(c, PII_PHONE_RE, "<PHONE>")
    return c


def char_entropy(c: Column | str) -> Column:
    """Unigram character entropy (bits/char) — a perplexity proxy for
    quality filtering: natural prose sits ~4-4.5 bits, base64/minified
    blobs higher, repeated-char spam near 0.

    This is the one text scorer here that is NOT a Catalyst expression:
    per-document character histograms need either an explode + two
    corpus-wide shuffles keyed by doc id (awful at 100 TB — the exploded
    frame is |chars| rows) or a per-row histogram, which Spark SQL cannot
    express without a fixed alphabet. An Arrow-batched pandas UDF keeps
    it shuffle-free: each batch computes numpy bincounts per row, and the
    scan stays a map-only job. (Same justification as the md5-heavy
    signature UDFs — see operators/dedup.py.)

    Rounded to 4 decimals so the DuckDB oracle (explode + group-by SQL,
    different summation order) hashes identically.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    def _entropy_batch(s):
        out = np.empty(len(s), dtype=np.float64)
        for i, txt in enumerate(s):
            if txt is None or len(txt) == 0:
                out[i] = np.nan
                continue
            _, counts = np.unique(
                np.frombuffer(txt.encode("utf-32-le"), dtype=np.uint32),
                return_counts=True,
            )
            p = counts / counts.sum()
            out[i] = -(p * np.log2(p)).sum()
        return pd.Series(np.round(out, 4))

    # no type hints: this module uses `from __future__ import annotations`,
    # which stringifies them beyond pandas_udf's resolver — pass the
    # return type positionally instead.
    _entropy = pandas_udf(_entropy_batch, DoubleType())

    return _entropy(F.col(c) if isinstance(c, str) else c)


def compression_ratio(c: Column | str, level: int = 6) -> Column:
    """zlib compression ratio (compressed/raw bytes) — the Gopher-style
    redundancy signal: highly repetitive/boilerplate text compresses far
    below natural prose (~0.3-0.5); near-random or encrypted blobs sit
    near 1.0. Deterministic (zlib is), but not SQL-expressible — verify
    by pytest, not oracle.

    Arrow-batched pandas UDF (zlib releases the GIL; per-row cost is the
    compressor, not Python) — shuffle-free, composes with scan pruning
    like every other per-row scorer here.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    c = F.col(c) if isinstance(c, str) else c

    def _ratio_batch(texts):
        import zlib

        out = []
        for t in texts:
            if not isinstance(t, str) or not t:
                out.append(None)
                continue
            raw = t.encode("utf-8")
            out.append(round(len(zlib.compress(raw, level)) / len(raw), 4))
        return pd.Series(out, dtype="float64")

    udf = pandas_udf(_ratio_batch, DoubleType())
    return udf(c)


def kept_window_fingerprints(c: Column | str, n: int = 8, keep_every: int = 4):
    """Winnowed rolling-window fingerprints WITH positions: per row, the
    array<struct<pos int, fp string>> of char n-gram md5s whose last hex
    nibble survives the 1/keep_every downsample (same family as
    :func:`rolling_fingerprints`, plus the position needed for
    passage-span analysis).

    Arrow-batched pandas UDF rather than posexplode+md5 Catalyst
    expressions: values are identical (same md5 hex, same nibble rule),
    but per-window hashing in a vectorized Python worker beats the
    JVM's per-row MessageDigest churn ~3-5x on corpus-sized inputs —
    the same measured trade documented on
    ``operators.dedup.minhash_signatures``. Still shuffle-free: one
    projection."""
    import hashlib

    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    # keep-rule rewritten on the digest BYTES: hex char h[31] is the low
    # nibble of digest byte 15, and the kept set "0123..."[:kmax] is
    # exactly nibble < kmax — so the 32-char hexdigest string is built
    # only for the ~1/keep_every windows that survive (r12: the hex
    # render of discarded windows was ~30% of kernel CPU)
    kmax = max(1, 16 // keep_every)
    md5 = hashlib.md5

    def _batch(texts):
        out = []
        for t in texts:
            if not isinstance(t, str) or len(t) < n:
                out.append([])
                continue
            rows = []
            if t.isascii():
                # ASCII fast path: encode ONCE and slice bytes — for
                # ASCII text byte windows == char windows, and slicing
                # a bytes object skips the per-window str slice+encode
                b = t.encode()
                for i in range(len(b) - n + 1):
                    d = md5(b[i : i + n]).digest()
                    if (d[15] & 0x0F) < kmax:
                        rows.append((i + 1, d.hex()))
            else:
                for i in range(len(t) - n + 1):
                    d = md5(t[i : i + n].encode()).digest()
                    if (d[15] & 0x0F) < kmax:
                        rows.append((i + 1, d.hex()))
            out.append(rows)
        return pd.Series(out)

    udf = pandas_udf(
        _batch,
        ArrayType(
            StructType(
                [
                    StructField("pos", IntegerType()),
                    StructField("fp", StringType()),
                ]
            )
        ),
    )
    c = F.col(c) if isinstance(c, str) else c
    return udf(c)
