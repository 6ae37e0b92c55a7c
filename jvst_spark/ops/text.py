"""Text-analysis operators: tokenization, shingles, language-ID,
quality scoring, fingerprinting.

All pure Column expressions (split/transform/aggregate) — vectorized,
shuffle-free, linear in input. Hashing uses md5 (portable across
Spark and the DuckDB oracle; xxhash64 exists in Spark but not DuckDB,
so headline queries avoid it — the reference's UEM uses xxHash64 seed
0, src/validate_uniq.c:25-51, which we mirror engine-side where no
oracle is needed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny stopword set for the language-ID heuristic (top English function
# words; the synthetic corpus is English-like regardless of its `lang`
# label, so the heuristic is exercised honestly)
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")


def tokens(col: Column) -> Column:
    """Whitespace tokenization, lowercased, empty tokens dropped."""
    return F.filter(F.split(F.lower(col), " "), lambda t: F.length(t) > 0)


def word_shingles(toks: Column, k: int = 3) -> Column:
    """k-gram word shingles, distinct, as strings joined by single
    spaces. Documents shorter than k words yield their full token join
    (one shingle) so no document is unshingleable.

    The token array is let-bound before the per-gram lambda: slicing
    an unbound `toks` EXPRESSION inside transform() re-evaluates the
    whole tokenization once per gram — O(n^2) per document (measured
    5x wall time on the 5-gram sf0.1 build)."""
    from jvst_spark.ops._expr import let_bound

    def build(tk: Column) -> Column:
        n = F.size(tk)
        grams = F.transform(
            F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(tk, i + 1, k)),
        )
        return F.array_distinct(grams)

    return let_bound(toks, build)


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_distinct_tokens, avg_token_len).

    The token array is let-bound (round-6): the three sibling output
    expressions each re-derived the split+filter otherwise — measured
    1.4s -> 0.95s at sf1.0."""
    from jvst_spark.ops._expr import let_bound

    def body(t: Column) -> Column:
        return F.struct(
            F.size(t).alias("n_tokens"),
            F.size(F.array_distinct(t)).alias("n_distinct_tokens"),
            F.round(
                F.aggregate(
                    t, F.lit(0.0), lambda acc, x: acc + F.length(x)
                )
                / F.greatest(F.size(t), F.lit(1)),
                6,
            ).alias("avg_token_len"),
        )

    p = let_bound(tokens(F.col(text_col)), body)
    return df.select("doc_id", p.alias("_p")).select(
        "doc_id",
        F.col("_p.n_tokens").alias("n_tokens"),
        F.col("_p.n_distinct_tokens").alias("n_distinct_tokens"),
        F.col("_p.avg_token_len").alias("avg_token_len"),
    )


def quality_score(
    df: DataFrame, text_col: str = "text", extra_cols: tuple = ()
) -> DataFrame:
    """Heuristic document quality in [0,1]:
    0.4 * min(n_tokens/50, 1)           (enough content)
    + 0.3 * distinct_ratio              (not degenerate repetition)
    + 0.3 * stopword_ratio * 5 capped   (natural-language-ness)

    extra_cols: passthrough columns to keep beside (doc_id, quality) —
    lets mixture/curation stages score without a join back.
    """
    from jvst_spark.ops._expr import let_bound

    # token array let-bound: the four sibling references re-derived
    # the tokenization otherwise (round-6)
    def score_of(t: Column) -> Column:
        n = F.greatest(F.size(t), F.lit(1))
        stop_hits = F.size(
            F.filter(t, lambda x: x.isin(*[F.lit(s) for s in EN_STOPWORDS]))
        )
        return (
            F.lit(0.4) * F.least(F.size(t) / F.lit(50.0), F.lit(1.0))
            + F.lit(0.3) * (F.size(F.array_distinct(t)) / n)
            + F.lit(0.3) * F.least(stop_hits * F.lit(5.0) / n, F.lit(1.0))
        )

    score = let_bound(tokens(F.col(text_col)), score_of)
    return df.select(
        "doc_id", *extra_cols, F.round(score, 6).alias("quality")
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram/stopword language-ID heuristic: English stopword density
    over tokens -> label. Deterministic, engine-portable."""
    from jvst_spark.ops._expr import let_bound

    # token array let-bound; density additionally computed once and
    # shared by both output columns through the struct (round-6)
    def density_of(t: Column) -> Column:
        n = F.greatest(F.size(t), F.lit(1))
        return (
            F.size(
                F.filter(
                    t, lambda x: x.isin(*[F.lit(s) for s in EN_STOPWORDS])
                )
            )
            / n
        )

    density = let_bound(tokens(F.col(text_col)), density_of)
    p = F.struct(
        F.when(density >= 0.05, F.lit("en")).otherwise(F.lit("unk")).alias(
            "lang_pred"
        ),
        F.round(density, 6).alias("stopword_density"),
    )
    return df.select("doc_id", p.alias("_p")).select(
        "doc_id",
        F.col("_p.lang_pred").alias("lang_pred"),
        F.col("_p.stopword_density").alias("stopword_density"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint: md5 over the sorted distinct token set.
    Robust to word order and duplication — two docs with the same
    vocabulary collide, the standard cheap near-dup prefilter."""
    t = F.array_sort(F.array_distinct(tokens(F.col(text_col))))
    return df.select(
        "doc_id", F.md5(F.concat_ws(" ", t)).alias("fingerprint")
    )


# BPE-ish pre-tokenizer regex (GPT-2-style, simplified to the
# Java/RE2-common subset: letter runs, single digits, punctuation
# runs). Rendered identically in Spark (java regex) and the DuckDB
# oracle (RE2) — both treat it the same because it avoids every
# dialect-divergent construct (see spec/redialect.py).
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\r]+"


def bpe_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_tokens, bpe_per_word): whitespace
    token count vs BPE-ish subword count — the standard budget metric
    for LLM training-data sizing. Pure Column expressions
    (regexp_extract_all), shuffle-free."""
    from jvst_spark.ops._expr import let_bound

    # both counts let-bound as scalars (round-6): n_ws/n_bpe each fed
    # two sibling expressions, re-running the split / regex scan
    nt = let_bound(tokens(F.col(text_col)), F.size)
    nbpe = let_bound(
        F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0),
        F.size,
    )
    p = F.struct(
        nt.alias("n_ws_tokens"),
        nbpe.alias("n_bpe_tokens"),
    )
    return df.select("doc_id", p.alias("_p")).select(
        "doc_id",
        F.col("_p.n_ws_tokens").alias("n_ws_tokens"),
        F.col("_p.n_bpe_tokens").alias("n_bpe_tokens"),
        F.round(
            F.col("_p.n_bpe_tokens")
            / F.greatest(F.col("_p.n_ws_tokens"), F.lit(1)),
            6,
        ).alias("bpe_per_word"),
    )


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1, the
    standard web-corpus quality gates): per document,

      top_bigram_share  — fraction of bigram positions occupied by the
                          single most frequent token bigram
      dup_trigram_frac  — fraction of trigram positions whose trigram
                          occurs more than once (1 - distinct/total)

    Both pure Column expressions, shuffle-free and linear per row: the
    most-frequent-bigram count folds once over the SORTED bigram array
    (longest equal run == max multiplicity) instead of exploding into
    a per-doc groupBy, so the corpus never shuffles.

    Returns (doc_id, n_bigrams, top_bigram_share, dup_trigram_frac)."""
    t = tokens(F.col(text_col))

    def over_tokens(tk: Column) -> Column:
        n = F.size(tk)
        # k-grams via zip_with over shifted slices (round-6): each
        # element is one concat over attribute slices instead of a
        # per-element slice()+concat_ws allocation — same strings,
        # ~1.5x cheaper interpreted. Trigrams extend the bigrams.
        m1 = F.greatest(n - 1, F.lit(0))
        m2 = F.greatest(n - 2, F.lit(0))
        bg_all = F.zip_with(
            F.slice(tk, 1, m1),
            F.slice(tk, 2, m1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
        bg = F.when(n >= 2, bg_all).otherwise(
            F.array().cast("array<string>")
        )
        tg = F.when(
            n >= 3,
            F.zip_with(
                F.slice(bg_all, 1, m2),
                F.slice(tk, 3, m2),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
        ).otherwise(F.array().cast("array<string>"))

        def over_bigrams(bg_b: Column) -> Column:
            # max multiplicity = longest equal run of the sorted array,
            # computed with flat array ops (round-6): run boundaries
            # are the 1-based positions where the value changes; run
            # lengths are adjacent boundary differences. This replaces
            # the struct-accumulator fold (per-element struct
            # construction was the query's hot spot). The m > 0 guard
            # matters twice: sequence(1, 0) DESCENDS, and
            # element_at(s, 0) errors under ANSI.
            from jvst_spark.ops._expr import let_bound

            def top_of(s: Column) -> Column:
                # s is let-bound (an attribute): the per-element filter
                # lambda reads it without re-sorting
                m = F.size(s)
                bounds = F.when(
                    m > 0,
                    F.filter(
                        F.sequence(F.lit(1), m),
                        lambda i: (i == 1)
                        | (F.element_at(s, i) != F.element_at(s, i - 1)),
                    ),
                ).otherwise(F.array().cast("array<int>"))
                return let_bound(
                    bounds,
                    lambda bs: F.coalesce(
                        F.array_max(
                            F.zip_with(
                                F.slice(bs, 1, F.size(bs)),
                                F.concat(
                                    F.slice(bs, 2, F.size(bs)),
                                    F.array(m + 1),
                                ),
                                lambda a, b: b - a,
                            )
                        ),
                        F.lit(0),
                    ),
                )

            top = let_bound(F.array_sort(bg_b), top_of)
            return F.struct(
                F.size(bg_b).alias("nb"),
                F.round(
                    top / F.greatest(F.size(bg_b), F.lit(1)), 6
                ).alias("share"),
            )

        def over_trigrams(tg_b: Column) -> Column:
            return F.when(
                F.size(tg_b) == 0, F.lit(0.0)
            ).otherwise(
                F.round(
                    F.lit(1.0)
                    - F.size(F.array_distinct(tg_b)) / F.size(tg_b),
                    6,
                )
            )

        # let-bind each gram array (transform-over-singleton) so the
        # O(n*k) gram build evaluates once per use site, not once per
        # reference inside collapsed projections
        bstats = F.element_at(
            F.transform(F.array(bg), over_bigrams), 1
        )
        dupfrac = F.element_at(
            F.transform(F.array(tg), over_trigrams), 1
        )
        return F.struct(
            bstats["nb"].alias("n_bigrams"),
            bstats["share"].alias("top_bigram_share"),
            dupfrac.alias("dup_trigram_frac"),
        )

    packed = F.element_at(F.transform(F.array(t), over_tokens), 1)
    return df.select(
        "doc_id",
        packed["n_bigrams"].alias("n_bigrams"),
        packed["top_bigram_share"].alias("top_bigram_share"),
        packed["dup_trigram_frac"].alias("dup_trigram_frac"),
    )


# PII detectors rendered in the Java-regex/RE2 common subset (same
# discipline as BPE_TOKEN_RE): simple character classes + bounded
# repetition only, so Spark and the DuckDB oracle count identically.
PII_EMAIL_RE = "[a-z0-9._]+@[a-z0-9-]+\\.[a-z]+"
PII_IPV4_RE = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
PII_PHONE_RE = "\\+[0-9]{7,13}"


def pii_scan(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII pattern counts (email / IPv4 / E.164-ish phone)
    — the redaction-pipeline pre-scan. One JVM regexp_count pass per
    pattern, shuffle-free; whole-stage codegen's subexpression
    elimination shares each count between its output column and the
    has_pii disjunction.

    Returns (doc_id, n_emails, n_ipv4, n_phones, has_pii)."""
    txt = F.col(text_col)
    n_email = F.regexp_count(txt, F.lit(PII_EMAIL_RE))
    n_ipv4 = F.regexp_count(txt, F.lit(PII_IPV4_RE))
    n_phone = F.regexp_count(txt, F.lit(PII_PHONE_RE))
    return df.select(
        "doc_id",
        n_email.alias("n_emails"),
        n_ipv4.alias("n_ipv4"),
        n_phone.alias("n_phones"),
        ((n_email + n_ipv4 + n_phone) > 0).alias("has_pii"),
    )


def winnowing_fingerprint(
    df: DataFrame, text_col: str = "text", k: int = 3, w: int = 4
) -> DataFrame:
    """Rolling-hash document fingerprint by winnowing (the MOSS
    scheme): token k-gram polynomial hashes, minimum per sliding
    window of w, distinct-sorted mins hashed into one fingerprint.
    Near-identical documents share most window minima, so fingerprint
    overlap survives local edits — unlike the exact bag-of-words
    fingerprint. Pure Column expressions; hashes are 32-bit md5
    prefixes folded base-31 (portable to the DuckDB oracle).

    Returns (doc_id, winnow_fp, n_grams)."""
    t = tokens(F.col(text_col))
    th = F.transform(
        t, lambda x: F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("long")
    )

    # TWO let-binding levels (element_at(transform(array(...), f), 1)):
    # without them Catalyst re-derives the token-hash array inside
    # every gram slice (O(n^2) md5 evaluations per document — measured
    # 19s for the 5k-doc bench vs <1s bound) and the gram array inside
    # every window slice.
    # round-6: both sliding passes compute via chained zip_with over
    # shifted slices — one vectorized combine per offset instead of a
    # per-position slice + fold/array_min (the per-element slice
    # machinery was the query's hot spot). Arithmetic is identical:
    # the base-31 fold from 0 is h1*31^(k-1)+...+hk either way, and
    # least() == array_min on the null-free hash arrays. Documents
    # shorter than the window keep the original per-position arm
    # (zip_with pads mismatched lengths with NULL, which would poison
    # the combine).
    def windows_of(g: Column) -> Column:
        ng = F.size(g)
        cntw = ng - (w - 1)
        acc_fast = F.slice(g, 1, cntw)
        for j in range(2, w + 1):
            acc_fast = F.zip_with(
                acc_fast, F.slice(g, j, cntw), lambda x, y: F.least(x, y)
            )
        m = F.when(ng >= w, acc_fast).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.greatest(ng - w, F.lit(0)) + 1),
                lambda i: F.array_min(F.slice(g, i, w)),
            )
        )
        return F.struct(
            F.md5(
                F.concat_ws(",", F.array_sort(F.array_distinct(m)))
            ).alias("fp"),
            ng.alias("ng"),
        )

    def over_hashes(th_b: Column) -> Column:
        n = F.size(th_b)
        cnt = n - (k - 1)
        gacc = F.slice(th_b, 1, cnt)
        for j in range(2, k + 1):
            gacc = F.zip_with(
                gacc, F.slice(th_b, j, cnt), lambda x, y: x * 31 + y
            )
        grams = F.when(n >= k, gacc).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.greatest(n - k, F.lit(0)) + 1),
                lambda i: F.aggregate(
                    F.slice(th_b, i, k),
                    F.lit(0).cast("long"),
                    lambda acc, h: acc * 31 + h,
                ),
            )
        )
        return F.element_at(F.transform(F.array(grams), windows_of), 1)

    packed = F.element_at(F.transform(F.array(th), over_hashes), 1)
    return df.select(
        "doc_id",
        packed["fp"].alias("winnow_fp"),
        packed["ng"].alias("n_grams"),
    )


def chunk_windows(
    df: DataFrame,
    text_col: str = "text",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split each document into overlapping token windows — the
    pre-tokenizer chunking step of a context-window training pipeline
    (each chunk later packs into a fixed-length sequence; stride <
    chunk_tokens gives the overlap that keeps boundary context).

    Window starts at 0, stride, 2*stride, ... while start < n_tokens;
    the last window may be short. Empty documents yield no chunks.
    One Generate (posexplode) per doc — no shuffle, no Python; output
    grows by ~n_tokens/stride rows per doc, linear in corpus size.
    The token array is let-bound (ops._expr.let_bound) so the explode
    does not re-derive split() per chunk.
    """
    from jvst_spark.ops._expr import let_bound
    if chunk_tokens <= 0 or stride <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    t = tokens(F.col(text_col))

    def chunks_of(tk: Column) -> Column:
        n = F.size(tk)
        starts = F.sequence(
            F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride)
        )
        return F.when(
            n > 0,
            F.transform(
                starts,
                lambda s: F.struct(
                    F.concat_ws(
                        " ", F.slice(tk, s + 1, chunk_tokens)
                    ).alias("chunk_text"),
                    F.least(n - s, F.lit(chunk_tokens)).alias(
                        "n_chunk_tokens"
                    ),
                ),
            ),
        ).otherwise(F.array().cast(
            "array<struct<chunk_text:string,n_chunk_tokens:int>>"
        ))

    bound = let_bound(t, chunks_of)
    exploded = df.select(
        "doc_id", F.posexplode(bound).alias("chunk_idx", "c")
    )
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("c.n_chunk_tokens").alias("n_chunk_tokens"),
        F.col("c.chunk_text").alias("chunk_text"),
    )


def unigram_logprob(df: DataFrame, text_col: str = "text") -> DataFrame:
    """CCNet-style unigram negative-log-likelihood quality score: the
    corpus unigram model scores every document by its mean -ln
    p(token). High avg_nll = rare-token-heavy (gibberish, boilerplate
    IDs, mojibake); low = stopword soup. The classic cheap perplexity
    proxy used to bucket training corpora (CCNet's head/middle/tail).

    Two passes by construction (the model IS a corpus aggregate):
    pass 1 builds the unigram table — bounded by VOCABULARY size, not
    corpus size, so it broadcasts; pass 2 rescans, collapses each doc
    to (token, count) pairs map-side BEFORE the broadcast-join against
    the model (join input is bounded by per-doc distinct tokens, not
    token occurrences), and folds sum(count * nll) / n_tokens. No
    shuffle carries raw token occurrences; nothing is per-row Python.
    At web scale the model would cap to top-V tokens + an OOV floor;
    here the corpus vocabulary is the model's support so no token is
    OOV.
    """
    tok = df.select(
        F.col("doc_id"), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    freq = tok.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("n_total"))
    per_doc_tok = tok.groupBy("doc_id", "tok").agg(
        F.count("*").alias("c")
    )
    scored = per_doc_tok.join(F.broadcast(freq), "tok").join(
        F.broadcast(total)
    )
    nll = -F.ln(F.col("cnt") / F.col("n_total"))
    return scored.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.round(F.sum(F.col("c") * nll) / F.sum("c"), 6).alias("avg_nll"),
    )
