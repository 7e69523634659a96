"""Text-analysis operators for large-scale training-data pipelines.

All pure Column expressions — JVM-side, whole-stage codegen, no Python
workers anywhere. Each function adds columns to a documents DataFrame
(``doc_id``, ``text``-shaped input; any extra columns pass through).

Operators:
- token counting (whitespace + a BPE-ish regex variant),
- quality scoring (length / punctuation / stopword / word-length signals),
- Gopher-style repetition filters (duplicate line/paragraph fractions,
  top n-gram character share — Rae et al. 2021 §A1.1),
- language ID (marker-word n-gram heuristic with deterministic tie-break),
- document fingerprinting (normalized md5 + a shingle-based rolling hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Marker words per language for the heuristic language ID.
LANG_MARKERS = {
    "en": r"\b(the|and|of|to|in|is)\b",
    "de": r"\b(der|die|und|das|ist|nicht)\b",
    "fr": r"\b(le|la|les|et|est|une)\b",
    "es": r"\b(el|los|las|es|una|que)\b",
}

#: BPE-ish token pattern: word pieces, numbers, or single non-space symbols.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text: Column) -> Column:
    """Non-empty whitespace-separated tokens."""
    return F.filter(F.split(text, r"\s+"), lambda x: x != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Tokens under a BPE-ish regex (letters / digits / single symbols)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0))


def with_token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return (docs
            .withColumn("n_tokens", token_count(t))
            .withColumn("n_tokens_bpe", bpe_ish_token_count(t)))


def with_quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/punctuation/stopword-ratio quality signals + composite score.

    The composite is a simple bounded heuristic: high stopword presence and
    moderate word length are good; extreme punctuation density is bad.
    """
    t = F.col(text_col)
    n_chars = F.length(t)

    # Round-8 optimization: same project-collapsing hazard as
    # with_repetition_signals — the token count and the two regexp
    # scans each fed several output columns, and every consumer got an
    # inlined copy. Let-bind the three expensive counts once, keep
    # each signal's arithmetic byte-identical, and emit through one
    # inline generator (never collapsed into consumers).
    def _sig(n_tok: Column, n_punct: Column, n_stop: Column) -> Column:
        mean_word_len = F.when(n_tok > 0, n_chars / n_tok) \
            .otherwise(F.lit(0.0))
        punct_ratio = F.when(n_chars > 0, n_punct / n_chars) \
            .otherwise(F.lit(0.0))
        stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
        score = (
            F.least(stop_ratio * 2.0, F.lit(1.0)) * 0.5
            + F.when((mean_word_len >= 3.0) & (mean_word_len <= 10.0),
                     F.lit(1.0)).otherwise(F.lit(0.0)) * 0.3
            + F.when(punct_ratio < 0.1, F.lit(1.0)).otherwise(F.lit(0.0))
            * 0.2)
        return F.struct(
            n_chars.alias("n_chars_calc"),
            n_tok.alias("n_tokens"),
            F.round(punct_ratio, 6).alias("punct_ratio"),
            F.round(stop_ratio, 6).alias("stopword_ratio"),
            F.round(mean_word_len, 6).alias("mean_word_len"),
            F.round(score, 6).alias("quality_score"))

    sig = _let(token_count(t), lambda n_tok: _let(
        F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), 0)),
        lambda n_punct: _let(
            F.size(F.regexp_extract_all(
                F.lower(t),
                F.lit(r"\b(the|and|of|to|a|in|is|it|that|for)\b"), 0)),
            lambda n_stop: _sig(n_tok, n_punct, n_stop))))
    return docs.select("*", F.inline(F.array(sig)))


def with_lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language scores + argmax prediction (ties break by the
    fixed preference order en > de > fr > es; 'und' = undetermined when all
    scores are zero)."""
    t = F.lower(F.col(text_col))
    scores = {lang: F.size(F.regexp_extract_all(t, F.lit(pat), 0))
              for lang, pat in LANG_MARKERS.items()}
    s = {k: F.col(f"lang_score_{k}") for k in LANG_MARKERS}
    pred = (
        F.when((s["en"] <= 0) & (s["de"] <= 0) & (s["fr"] <= 0)
               & (s["es"] <= 0), F.lit("und"))
        .when((s["en"] >= s["de"]) & (s["en"] >= s["fr"])
              & (s["en"] >= s["es"]), F.lit("en"))
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["es"]), F.lit("de"))
        .when(s["fr"] >= s["es"], F.lit("fr"))
        .otherwise(F.lit("es")))
    out = docs
    for lang, score in scores.items():
        out = out.withColumn(f"lang_score_{lang}", score)
    return out.withColumn("lang_pred", pred)


def _line_char_sum(lines: Column) -> Column:
    """Total characters across an array of strings (pure fold)."""
    return F.aggregate(lines, F.lit(0).cast("long"),
                       lambda acc, x: acc + F.length(x))


def _let(value: Column, body) -> Column:
    """Single-evaluation binding for expression trees: evaluate *value*
    once and share it across every use inside *body* (a lambda over the
    bound Column). Implemented as ``transform(array(v), x -> body(x))[0]``
    — Catalyst has no rule that rewrites through a lambda function, so
    the optimizer cannot inline a copy of *value* into each consumer
    the way project collapsing does to ordinary column aliases."""
    return F.transform(F.array(value), body).getItem(0)


def _dup_fraction(parts: Column) -> Column:
    """(len - distinct len) / len over an array; 0 for empty arrays."""
    n = F.size(parts)
    return F.when(n > 0,
                  (n - F.size(F.array_distinct(parts)))
                  / n.cast("double")).otherwise(F.lit(0.0))


def _dup_char_fraction(parts: Column) -> Column:
    """Fraction of characters in repeat occurrences beyond each part's
    first appearance; 0 when the array is empty or all-empty."""
    total = _line_char_sum(parts)
    uniq = _line_char_sum(F.array_distinct(parts))
    return F.when(total > 0,
                  (total - uniq) / total.cast("double")) \
        .otherwise(F.lit(0.0))


def top_ngram_char_fraction(text: Column, n: int) -> Column:
    """Fraction of the document's characters covered by its most frequent
    word ``n``-gram: count(top gram) * len(top gram) / len(text) — the
    Gopher repetition signal (Rae et al. 2021, table A1). Ties break to
    the lexicographically smallest gram (deterministic; the count and
    gram length are what matter). Documents shorter than ``n`` tokens
    score 0.

    Pure expression: the gram array is sorted and a single ``aggregate``
    fold tracks the longest equal-run — no explode, no per-doc shuffle;
    at 10^12 docs this stays a map-only pass like the other signals."""
    return _top_ngram_from_toks(text, tokens(F.lower(text)), n)


def _top_ngram_from_toks(text: Column, toks: Column, n: int) -> Column:
    """:func:`top_ngram_char_fraction` over an already-tokenized
    column, so callers computing several gram sizes (or other
    token-derived signals) can bind the tokenization once via
    :func:`_let` instead of re-splitting the text per signal."""
    grams = F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(0), F.size(toks) - n),
                    lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))),
    ).otherwise(F.array().cast("array<string>"))
    zero = F.struct(F.lit("").alias("prev"),
                    F.lit(0).alias("run"),
                    F.lit(0).alias("best"),
                    F.lit("").alias("bestg"))

    def step(acc: Column, x: Column) -> Column:
        newrun = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        better = newrun > acc["best"]
        return F.struct(
            x.alias("prev"), newrun.alias("run"),
            F.when(better, newrun).otherwise(acc["best"]).alias("best"),
            F.when(better, x).otherwise(acc["bestg"]).alias("bestg"))

    top = F.aggregate(F.array_sort(grams), zero, step)
    n_chars = F.length(text)
    return F.when(
        (n_chars > 0) & (top["best"] > 0),
        (top["best"] * F.length(top["bestg"])) / n_chars.cast("double")
    ).otherwise(F.lit(0.0))


def with_repetition_signals(docs: DataFrame,
                            text_col: str = "text") -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1) — the
    first-pass quality gates of a pretraining pipeline, next to
    :func:`with_quality_score`. All pure Column expressions (zero
    Python, map-only at any scale):

    - ``n_lines`` — nonempty trimmed lines (split on ``\\n``);
    - ``dup_line_frac`` — fraction of line slots occupied by repeats of
      an earlier identical line;
    - ``dup_line_char_frac`` — fraction of line characters in those
      repeats (long duplicated lines weigh more);
    - ``dup_para_frac`` — same repeat fraction over paragraphs (split on
      blank lines, ``\\n{2,}``);
    - ``top_2gram_char_frac`` / ``top_3gram_char_frac`` — characters
      covered by the most frequent word 2-/3-gram over total characters.

    Typical Gopher cut-offs: drop docs with dup_line_frac > 0.30,
    dup_para_frac > 0.30, top_2gram_char_frac > 0.20,
    top_3gram_char_frac > 0.18."""
    t = F.col(text_col)
    lines = F.filter(
        F.transform(F.split(t, r"\n"), lambda x: F.trim(x)),
        lambda x: x != "")
    paras = F.filter(
        F.transform(F.split(t, r"\n{2,}"), lambda x: F.trim(x)),
        lambda x: x != "")
    # Round-8 optimization (guide §1.2 "per-task work"): the six
    # signals used to be six withColumn expressions, and Catalyst's
    # project collapsing inlined a fresh copy of `lines` / `paras` /
    # the tokenization into each consumer — the higher-order signal
    # expressions then evaluated the shared arrays several times per
    # row (measured ~25% of the doc_repetition row). Let-bindings
    # (`_let`: transform over a one-element array — no Catalyst rule
    # rewrites through the lambda, so the optimizer cannot duplicate
    # the bound value) evaluate each shared array once, and the struct
    # is emitted through one `inline` generator, which — unlike a
    # projection — is never collapsed into downstream consumers. Each
    # signal's own arithmetic is byte-for-byte the expression it
    # always was, so values (and the _quant6 oracle rows) are
    # unchanged. Still zero Python, still map-only at any scale.
    sig = _let(lines, lambda l: _let(paras, lambda p: _let(
        tokens(F.lower(t)), lambda tk: _let(
        F.array_distinct(l), lambda dl: F.struct(
            F.size(l).alias("n_lines"),
            F.round(F.when(F.size(l) > 0,
                           (F.size(l) - F.size(dl))
                           / F.size(l).cast("double"))
                    .otherwise(F.lit(0.0)), 6).alias("dup_line_frac"),
            F.round(F.when(_line_char_sum(l) > 0,
                           (_line_char_sum(l) - _line_char_sum(dl))
                           / _line_char_sum(l).cast("double"))
                    .otherwise(F.lit(0.0)), 6)
            .alias("dup_line_char_frac"),
            F.round(_dup_fraction(p), 6).alias("dup_para_frac"),
            F.round(_top_ngram_from_toks(t, tk, 2), 6)
            .alias("top_2gram_char_frac"),
            F.round(_top_ngram_from_toks(t, tk, 3), 6)
            .alias("top_3gram_char_frac"))))))
    return docs.select("*", F.inline(F.array(sig)))


def normalized_fingerprint(text: Column) -> Column:
    """md5 of casefolded, whitespace-collapsed text — near-dup-robust to
    spacing/case-only edits."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")))


def rolling_shingle_fingerprint(text: Column, n: int = 3) -> Column:
    """Order-sensitive document fingerprint: xor-fold of hashed word
    ``n``-grams (a rolling-hash analog that is pure-expression friendly)."""
    toks = tokens(F.lower(text))
    shingles = F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(0), F.size(toks) - n),
                    lambda i: F.xxhash64(F.concat_ws(" ",
                                                     F.slice(toks, i + 1, n)))),
    ).otherwise(F.array(F.xxhash64(F.concat_ws(" ", toks))))
    # xor-fold via aggregate: order-insensitive-safe reduction of the
    # shingle hash multiset (xor is associative/commutative).
    return F.aggregate(shingles, F.lit(0).cast("long"),
                       lambda acc, x: acc.bitwiseXOR(x))


def with_fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return (docs
            .withColumn("fingerprint_md5", normalized_fingerprint(t))
            .withColumn("fingerprint_shingle",
                        rolling_shingle_fingerprint(t)))


#: The HTML -> text extraction pipeline as an ordered regex chain.
#: Every step is expressible in BOTH Spark (Java regex) and DuckDB (RE2
#: with the 'g' flag), so a SQL oracle reproduces the extraction
#: byte-for-byte — the property every operator here trades on. Order
#: matters: script/style bodies go first (their content is not text),
#: block-level closers become newlines before generic tag stripping,
#: and &amp; decodes LAST so "&amp;lt;" comes out as "&lt;", not "<".
HTML_TEXT_STEPS = [
    (r"(?is)<script\b[^>]*>.*?</script>", " "),
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?is)<(?:br|hr)\s*/?>", "\n"),
    (r"(?is)</(?:p|div|h1|h2|h3|h4|h5|h6|li|tr|table|blockquote)>", "\n"),
    (r"(?s)<[^>]*>", " "),
    (r"&lt;", "<"), (r"&gt;", ">"), (r"&quot;", "\""),
    (r"&#39;", "'"), (r"&nbsp;", " "), (r"&amp;", "&"),
    (r"[ \t\r\f]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n{2,}", "\n"),
    (r"^[ \n]+", ""),
    (r"[ \n]+$", ""),
]


def html_to_text(html: Column) -> Column:
    """Boilerplate-stripping HTML -> text as a pure Column expression:
    drop script/style bodies, turn block boundaries into newlines, strip
    remaining tags, decode the common entities, normalize whitespace.

    Zero Python — the whole chain runs in whole-stage codegen, so at
    10^12 pages this is a map-only pass like every scalar function here.
    Not a browser: malformed nesting degrades gracefully (unclosed tags
    strip, unknown entities pass through), which is the right trade for
    a corpus pass. Anchored strips finish the chain (not ``trim`` —
    its trimmed character set differs across engines)."""
    out = html
    for pat, rep in HTML_TEXT_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return out


def with_extracted_text(docs: DataFrame, html_col: str = "html",
                        out_col: str = "extracted_text") -> DataFrame:
    """Attach the extracted text of an HTML column (binary or string)."""
    col = F.col(html_col)
    return docs.withColumn(
        out_col, html_to_text(col.cast("string")))
