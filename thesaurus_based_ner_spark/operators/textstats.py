"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All pure built-in expressions (JVM-side, codegen),
each mirrorable in ANSI SQL for DuckDB oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from thesaurus_based_ner_spark.functions.text import TOKEN_RE

# tiny per-language stopword lists for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "a", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den", "von", "mit"],
    "fr": ["le", "la", "les", "de", "et", "est", "un", "une", "des", "que"],
    "es": ["el", "la", "los", "de", "y", "es", "un", "una", "que", "en"],
}


def _tokens_lower(text_col: str):
    return F.transform(
        F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0)),
        lambda t: F.lower(t),
    )


def _ngrams(
    df: DataFrame, id_col: str, text_col: str, n: int, lower: bool = False
) -> DataFrame:
    """(id, p, gram): token n-grams streamed off a doc-keyed posexplode +
    lead window — shared by winnowing, repetition stats, and phrase
    boilerplate. The gram and its validity guard MUST live in one
    projection: a filter between them would re-evaluate the leads over
    the filtered rows and silently shorten grams at partition ends
    (concat_ws skips nulls)."""
    src = F.lower(F.col(text_col)) if lower else F.col(text_col)
    toks = F.regexp_extract_all(src, F.lit(TOKEN_RE), F.lit(0))
    pos = df.select(
        F.col(id_col).alias("id"), F.posexplode(toks).alias("p", "tok")
    )
    w0 = Window.partitionBy("id").orderBy("p")
    gram = F.concat_ws(" ", *[F.lead("tok", j).over(w0) for j in range(n)])
    return (
        pos.select(
            "id",
            "p",
            gram.alias("gram"),
            F.lead("tok", n - 1).over(w0).alias("__last"),
        )
        .filter(F.col("__last").isNotNull())
        .drop("__last")
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic language ID: argmax stopword-hit ratio across languages.

    Ties (and zero hits) fall back to 'und'. Deterministic: languages are
    compared in a fixed order with strict-greater, so the first language in
    STOPWORDS order wins ties — same rule in SQL oracles.
    """
    toks = _tokens_lower(text_col)
    out = df.select(F.col(id_col).alias("id"), toks.alias("__toks"))
    for lang, words in STOPWORDS.items():
        hits = F.size(F.array_intersect(F.array_distinct(F.col("__toks")), F.array(*[F.lit(w) for w in words])))
        out = out.withColumn(f"__hits_{lang}", hits.cast("bigint"))
    best = F.lit("und")
    best_hits = F.lit(0).cast("bigint")
    for lang in STOPWORDS:  # fixed order; strict > keeps first-wins ties
        cond = F.col(f"__hits_{lang}") > best_hits
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_hits = F.when(cond, F.col(f"__hits_{lang}")).otherwise(best_hits)
    return out.select(
        "id", best.alias("pred_lang"), best_hits.alias("stopword_hits")
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + score.

    score = 0.4·min(n_tokens/100, 1) + 0.3·(1 − punct_ratio) +
            0.3·min(stopword_ratio·5, 1), rounded to 6 dp.
    """
    toks = F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0))
    en_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    base = df.select(
        F.col(id_col).alias("id"),
        F.length(text_col).cast("bigint").alias("n_chars"),
        toks.alias("__toks"),
    ).select(
        "id",
        "n_chars",
        F.size("__toks").cast("bigint").alias("n_tokens"),
        (
            F.size(F.filter("__toks", lambda t: t.rlike("^[^A-Za-z0-9_]$")))
            / F.greatest(F.size("__toks"), F.lit(1))
        ).alias("punct_ratio"),
        (
            F.size(F.filter("__toks", lambda t: F.lower(t).isin(STOPWORDS["en"])))
            / F.greatest(F.size("__toks"), F.lit(1))
        ).alias("stopword_ratio"),
    )
    score = (
        0.4 * F.least(F.col("n_tokens") / 100.0, F.lit(1.0))
        + 0.3 * (1.0 - F.col("punct_ratio"))
        + 0.3 * F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0))
    )
    return base.select(
        "id",
        "n_chars",
        "n_tokens",
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality"),
    )


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace tokens, regex (BPE-ish) tokens, distinct tokens."""
    ws = F.split(F.trim(F.col(text_col)), r"\s+")
    rx = F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0))
    return df.select(
        F.col(id_col).alias("id"),
        F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0))
        .otherwise(F.size(ws))
        .cast("bigint")
        .alias("ws_tokens"),
        F.size(rx).cast("bigint").alias("re_tokens"),
        F.size(F.array_distinct(rx)).cast("bigint").alias("distinct_tokens"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic document fingerprint: min/max md5 over token set +
    full-text md5 — an order-invariant content signature (1-permutation
    MinHash). Portable to ANSI SQL.
    """
    toks = _tokens_lower(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        F.md5(F.col(text_col)).alias("text_md5"),
        F.array_min(F.transform(F.array_distinct(toks), F.md5)).alias("min_tok_md5"),
        F.array_max(F.transform(F.array_distinct(toks), F.md5)).alias("max_tok_md5"),
    )


def winnow_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, window: int = 4
) -> DataFrame:
    """MOSS-style winnowing (Schleimer et al. 2003): rolling k-gram hashes,
    one fingerprint selected per sliding window of `window` consecutive
    grams (the minimum hash, rightmost on ties), deduplicated.

    Guarantee: any two documents sharing a token run of length
    ≥ window + k - 1 share at least one selected fingerprint — the
    document-fingerprint primitive for plagiarism/near-dup detection at
    corpus scale. Gram hash = md5 of the space-joined gram so a SQL oracle
    reproduces selection bit-exactly; all ops are window functions over
    doc-partitioned rows (one doc-keyed shuffle, no Python).

    Returns (id, pos, fp): selected gram position + its md5 fingerprint.
    """
    g = _ngrams(df, id_col, text_col, k, lower=True).withColumn(
        "gh", F.md5(F.col("gram"))
    )
    wf = Window.partitionBy("id").orderBy("p").rowsBetween(0, window - 1)
    sel = (
        g.withColumn(
            "__m", F.min(F.struct(F.col("gh"), (-F.col("p")).alias("np"))).over(wf)
        )
        .withColumn("__c", F.count("gh").over(wf))
        .filter(F.col("__c") == window)
        .select(
            "id",
            (-F.col("__m.np")).cast("bigint").alias("pos"),
            F.col("__m.gh").alias("fp"),
        )
        .distinct()
    )
    return sel


_SENT_SEP = "\x1e"
# engine-portable sentence boundary: lookbehind isn't RE2-compatible, so
# mark boundaries with a capture-replace then split — identical boundaries
# to functions/text.SENT_SPLIT_RE on both Spark (Java regex) and DuckDB.
_SENT_MARK_RE = r"([.!?])\s+"


def _sentences(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    marked = F.regexp_replace(F.col(text_col), _SENT_MARK_RE, "$1" + _SENT_SEP)
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(F.split(marked, _SENT_SEP)).alias("sid", "snt"),
        )
        .withColumn("snt", F.trim("snt"))
        .filter(F.length("snt") > 0)
    )


def boilerplate_sentences(
    df: DataFrame, id_col: str, text_col: str, min_docs: int = 3
) -> DataFrame:
    """C4-style boilerplate detection: sentences that occur in ≥ min_docs
    DISTINCT documents (navigation chrome, disclaimers, license blurbs).
    One shuffle on the sentence string with map-side partial aggregation;
    at corpus scale group on md5(snt) instead to bound key width.
    Returns (snt, n_docs)."""
    return (
        _sentences(df, id_col, text_col)
        .groupBy("snt")
        .agg(F.countDistinct("id").cast("bigint").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def remove_boilerplate(
    df: DataFrame, id_col: str, text_col: str, min_docs: int = 3
) -> DataFrame:
    """Drop boilerplate sentences from every document (the C4 cleaning
    step): sentences in ≥ min_docs docs are anti-joined away (broadcast —
    the boilerplate set is tiny relative to the corpus) and each document
    is reassembled in sentence order. Returns (id, clean_text)."""
    snts = _sentences(df, id_col, text_col)
    boiler = boilerplate_sentences(df, id_col, text_col, min_docs).select("snt")
    kept = snts.join(F.broadcast(boiler), "snt", "left_anti")
    return kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sid", "snt"))),
                lambda s: s["snt"],
            ),
            " ",
        ).alias("clean_text")
    )


def tfidf_topk(df: DataFrame, id_col: str, text_col: str, k: int = 5) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF — the classic
    keyword/topic signal for corpus exploration and weak labeling.

    score = tf · ln(N / df), N = corpus doc count (1-row broadcast
    aggregate, never collected). Ranking uses the 6-dp ROUNDED score:
    mathematically-equal scores reached via different float paths (e.g.
    2·ln10 vs ln100) can differ by an ulp across engines, and rounding
    first makes the (score, term) order engine-portable. Shuffles: one on
    (id, term) for TF, one dim-sized on term for DF, one on id for the
    top-k window — all map-side combined.

    Returns (id, term, tf, score, rk), rk = 1..k.
    """
    t = df.select(
        F.col(id_col).alias("id"), F.explode(_tokens_lower(text_col)).alias("term")
    )
    tf = t.groupBy("id", "term").agg(F.count("*").alias("tf"))
    # document frequency as a window count over the tf frame (its rows are
    # unique per (id, term)): a groupBy-then-self-join would recompute the
    # whole explode+aggregate subtree — TWO corpus scans in the physical
    # plan — where the window is one extra term-keyed shuffle on the
    # already-aggregated (doc, term) rows.
    dfreq = F.count("*").over(Window.partitionBy("term"))
    n = df.agg(F.countDistinct(id_col).cast("double").alias("n"))
    scored = (
        tf.withColumn("df", dfreq)
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score", F.round(F.col("tf") * F.log(F.col("n") / F.col("df")), 6)
        )
    )
    w = Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "id",
            "term",
            F.col("tf").cast("bigint").alias("tf"),
            "score",
            F.col("rk").cast("int").alias("rk"),
        )
    )


def unigram_logprob(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus-unigram log-probability per document — the language-model
    fluency signal (documents whose tokens are corpus-atypical score
    low; spam / lorem-ipsum / wrong-language text falls out of band).

    avg_lp = (Σ_t ln c_t − n·ln N) / n over the doc's n token
    occurrences, c_t = corpus count of token t, N = corpus token count.
    Single corpus scan: per-occurrence counts come from a term-keyed
    window over the exploded stream (no self-join re-scan — see
    tfidf_topk), N from a 1-row aggregate of the per-doc frame,
    broadcast back. Returns (id, n_tokens, avg_logprob).
    """
    pos = df.select(
        F.col(id_col).alias("id"), F.explode(_tokens_lower(text_col)).alias("term")
    )
    c = F.count("*").over(Window.partitionBy("term"))
    occ = pos.withColumn("__lnc", F.log(c))
    per_doc = occ.groupBy("id").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.sum("__lnc").alias("__slc"),
    )
    n_total = per_doc.agg(F.sum("n_tokens").cast("double").alias("__N"))
    return (
        per_doc.crossJoin(F.broadcast(n_total))
        .select(
            "id",
            "n_tokens",
            F.round(
                (F.col("__slc") - F.col("n_tokens") * F.log(F.col("__N")))
                / F.col("n_tokens"),
                6,
            ).alias("avg_logprob"),
        )
    )


def repetition_stats(
    df: DataFrame, id_col: str, text_col: str, n: int = 2
) -> DataFrame:
    """Gopher-style repetition features (Rae et al. 2021 §A1.1): per
    document, the fraction of token n-gram occurrences claimed by the
    single most frequent n-gram and by all n-grams occurring more than
    once. High values flag machine-generated / templated pages that slip
    past length- and punctuation-based quality scores.

    Plan: n-grams stream off a doc-keyed posexplode + lead window, then
    groupBy (id, gram) and a final groupBy id — the per-doc shuffles are
    mention-sized, map-side partially aggregated, no Python. Returns
    (id, n_grams, top_ngram_frac, dup_ngram_frac).
    """
    g = _ngrams(df, id_col, text_col, n)
    per_gram = g.groupBy("id", "gram").agg(F.count("*").alias("c"))
    return per_gram.groupBy("id").agg(
        F.sum("c").cast("bigint").alias("n_grams"),
        F.round(F.max("c") / F.sum("c"), 6).alias("top_ngram_frac"),
        F.round(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)) / F.sum("c"), 6
        ).alias("dup_ngram_frac"),
    )


def quality_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_tokens: int = 20,
    max_top_bigram_frac: float = 0.10,
    max_dup_bigram_frac: float = 0.90,
    min_distinct_frac: float = 0.20,
) -> DataFrame:
    """Combined keep/drop decision per document à la Gopher rules: long
    enough, not dominated by one bigram, not mostly repeated bigrams, and
    a healthy distinct-token ratio. Emits the document id, each rule bit,
    and `keep` = AND of all rules, so downstream filters stay explainable.

    Both inputs are per-doc aggregates over the same exploded token
    stream; the join is doc-keyed (co-partitioned after the aggs).
    """
    toks = F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0))
    tok_stats = df.select(
        F.col(id_col).alias("id"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        (F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1))).alias(
            "__distinct_frac"
        ),
    )
    rep = repetition_stats(df, id_col, text_col, n=2)
    joined = tok_stats.join(rep, "id", "left")
    return joined.select(
        "id",
        "n_tokens",
        (F.col("n_tokens") >= min_tokens).alias("len_ok"),
        F.coalesce(F.col("top_ngram_frac") <= max_top_bigram_frac, F.lit(True)).alias(
            "top_bigram_ok"
        ),
        F.coalesce(F.col("dup_ngram_frac") <= max_dup_bigram_frac, F.lit(True)).alias(
            "dup_bigram_ok"
        ),
        (F.col("__distinct_frac") >= min_distinct_frac).alias("distinct_ok"),
    ).select(
        "*",
        (
            F.col("len_ok")
            & F.col("top_bigram_ok")
            & F.col("dup_bigram_ok")
            & F.col("distinct_ok")
        ).alias("keep"),
    )


def boilerplate_phrases(
    df: DataFrame, id_col: str, text_col: str, n: int = 5, min_docs: int = 3
) -> DataFrame:
    """Repeated-phrase boilerplate: token n-grams occurring in ≥ min_docs
    DISTINCT documents — the finer-grained sibling of sentence-level
    boilerplate for corpora whose chrome isn't sentence-aligned. N-grams
    stream map-side off a posexplode + lead window (doc-keyed), then one
    shuffle on the phrase with partial aggregation; at corpus scale group
    on xxhash64(phrase) to bound shuffle key width.
    Returns (phrase, n_docs)."""
    g = _ngrams(df, id_col, text_col, n).withColumnRenamed("gram", "phrase")
    return (
        g.groupBy("phrase")
        .agg(F.countDistinct("id").cast("bigint").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )
