"""Text-analysis operators for LLM training-data pipelines
(SURVEY.md UD5 / north star): tokenization stats, quality scoring,
language identification, document fingerprinting.

Everything is JVM-side Catalyst expressions (split / higher-order
array functions / regexp) — no Python UDFs, so the hot path
whole-stage-codegens and scales linearly with executors.  The shared
constants (stopword profiles, regexes) also generate the DuckDB oracle
SQL in ``plans.queries_llm`` so both engines score identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Token = maximal run of non-whitespace (the BPE-ish fallback is
# WORDISH_RE, which also splits punctuation off).
WS_RE = r"\s+"
WORDISH_RE = r"[a-zA-Z0-9']+|[^a-zA-Z0-9\s]"

# Minimal per-language stopword profiles (top function words).  Used
# for both the stopword-ratio quality signal and the language-ID
# scorer; langs match the fixture domain (FIXTURES.md: de/en/es/fr/zh).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "you", "that"],
    "de": ["der", "die", "und", "das", "ist", "ich", "nicht", "mit", "ein", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "dans", "que"],
    "zh": ["的", "了", "是", "我", "不", "在", "有", "他", "这", "中"],
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokens of trimmed text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), WS_RE)


def wordish_tokens(text: Column | str) -> Column:
    """BPE-ish regex tokens: word runs plus individual punctuation."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(WORDISH_RE), 0)


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def stopword_hits(text: Column | str, lang: str) -> Column:
    """How many tokens are in ``lang``'s stopword profile."""
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(sw, F.lower(t))))


def punct_ratio(text: Column | str) -> Column:
    # greatest(len, 1): an empty document is ratio 0, not 0/0 — a
    # NULL/NaN here poisons quality_score and a "quality < 0.5" junk
    # filter then FAILS to select the empty doc for removal
    c = F.col(text) if isinstance(text, str) else text
    return F.length(F.regexp_replace(c, r"[^.!?,;:]", "")) / F.greatest(
        F.length(c), F.lit(1)
    )


def mean_token_len(text: Column | str) -> Column:
    # same zero guard as punct_ratio: no tokens ⇒ mean length 0
    t = tokens(text)
    return F.aggregate(
        t, F.lit(0.0), lambda acc, x: acc + F.length(x)
    ) / F.greatest(F.size(t), F.lit(1))


def quality_score(text: Column | str) -> Column:
    """Deterministic [0,1]-ish quality score: length band + stopword
    presence + moderate punctuation — the classic cheap pre-filter for
    web-scraped corpora (Gopher/C4-style rules, arithmetic simplified).

    score = 0.4·len_ok + 0.4·min(stop_ratio·5, 1) + 0.2·(1 − min(punct·10, 1))
    """
    n = token_count(text)
    len_ok = F.when((n >= 10) & (n <= 100000), 1.0).otherwise(0.0)
    stop = sum(
        (stopword_hits(text, lang) for lang in LANG_STOPWORDS),
        F.lit(0),
    )
    stop_ratio = stop / F.greatest(n, F.lit(1))  # empty doc ⇒ 0, not 0/0
    punct = punct_ratio(text)
    return (
        0.4 * len_ok
        + 0.4 * F.least(stop_ratio * 5, F.lit(1.0))
        + 0.2 * (1 - F.least(punct * 10, F.lit(1.0)))
    )


def language_scores(text: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit share (n-gram heuristic LID): score_L =
    hits_L / n_tokens."""
    n = token_count(text)
    return {
        lang: stopword_hits(text, lang) / n for lang in LANG_STOPWORDS
    }


def predicted_language(text: Column | str, default: str = "en") -> Column:
    """Argmax over ``language_scores`` with deterministic tie-breaking
    (lexicographic lang order); ``default`` when no profile hits."""
    scores = language_scores(text)
    best_score = F.greatest(*scores.values())
    expr = None
    for lang in sorted(scores):  # lexicographic tie-break
        cond = scores[lang] == best_score
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    return F.when(best_score > 0, expr).otherwise(default)


def winnow_fingerprints(df, text_col: str, id_col: str, k: int = 8, w: int = 4):
    """Winnowing document fingerprints (rolling-hash selection, the
    MOSS scheme): hash every character ``k``-gram, then keep the
    minimum hash of each window of ``w`` consecutive grams — guarantees
    any shared substring of length ≥ ``k + w - 1`` contributes a shared
    fingerprint, at ~1/w the density of the full gram set.

    The "rolling hash" is md5 compared lexicographically on hex —
    chosen over a polynomial hash because both engines (Spark and the
    DuckDB oracle) provide bit-identical md5, keeping the operator
    hash-parity-checkable.

    DataFrame-level on purpose: the gram array must be **materialized**
    between the two transforms — the window-min lambda indexes it via
    ``slice``, and an inlined gram expression would re-evaluate per
    window (the ``operators.dedup.shingles`` plan-barrier rule).

    Output: (doc, fp) with fp the distinct fingerprint set."""
    t = F.col("__t")
    n_grams = F.length(t) - (k - 1)
    grams = F.transform(
        F.when(n_grams >= 1, F.sequence(F.lit(1), n_grams)).otherwise(
            F.array().cast("array<int>")
        ),
        lambda i: F.md5(t.substr(i, F.lit(k)).cast("binary")),
    )
    g = F.col("__grams")
    n_windows = F.size(g) - (w - 1)
    window_mins = F.array_distinct(
        F.transform(
            F.when(n_windows >= 1, F.sequence(F.lit(1), n_windows)).otherwise(
                F.array().cast("array<int>")
            ),
            lambda j: F.array_min(F.slice(g, j, w)),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("__t"))
        .select("doc", grams.alias("__grams"))
        .select("doc", window_mins.alias("fp"))
    )


def word_bigrams(text: Column | str) -> Column:
    """Adjacent word pairs ("a b") of the whitespace tokens — the unit
    of the repetition quality signal.

    Built as ``zip_with(t[:-1], t[1:])`` rather than a transform that
    indexes with ``element_at``: Catalyst does not CSE the ``split``
    inside a lambda, so per-index access re-tokenizes the document for
    EVERY position — O(len²) per doc, the 13× cliff ``operators/dedup``
    documents.  The zip of two slices is linear and measured 16× faster
    at sf0.1 with bit-identical output."""
    t = tokens(text)
    n = F.size(t)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(t, 1, n - 1),
            F.slice(t, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))


# PII patterns (conservative syntax that parses identically under
# Java regex and RE2, so the DuckDB oracle replays the exact scrub).
# Application ORDER is part of the contract: emails first, then IPv4
# (else the phone pattern would eat dotted digit runs), then long card
# numbers, then phones.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("card", r"\b\d{12,19}\b", "[NUM]"),
    ("phone", r"\+?\d[\d\s().-]{7,}\d", "[PHONE]"),
)


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Occurrence count per PII class, measured on the progressively
    redacted text (the same order the scrub applies), so counts and
    redaction agree — an email's digits are never double-counted as a
    phone."""
    c = F.col(text) if isinstance(text, str) else text
    out: dict[str, Column] = {}
    for name, pat, rep in PII_PATTERNS:
        out[name] = F.size(F.regexp_extract_all(c, F.lit(pat), 0))
        c = F.regexp_replace(c, pat, rep)
    return out


def redact_pii(text: Column | str) -> Column:
    """Training-data scrub: replace emails / IPv4s / long card-like
    digit runs / phone numbers with typed placeholders.  Pure
    ``regexp_replace`` chain — JVM-side, whole-stage-codegen'd, and
    bit-reproducible in the DuckDB oracle (same patterns, same order,
    global flag)."""
    c = F.col(text) if isinstance(text, str) else text
    for _, pat, rep in PII_PATTERNS:
        c = F.regexp_replace(c, pat, rep)
    return c


def fingerprint(text: Column | str) -> Column:
    """Normalization fingerprint: md5 of lowercased,
    whitespace-collapsed text — the exact-dedup key (rolling-hash
    document signature, reference's md5 uniquifier pattern
    ``generator.py:111``)."""
    c = F.col(text) if isinstance(text, str) else text
    normalized = F.regexp_replace(F.lower(F.trim(c)), WS_RE, " ")
    return F.md5(normalized.cast("binary"))


def _word_grams(df, text_col: str, id_col: str, out_id: str, k: int):
    """Distinct (doc, k-gram) pairs, JVM-side: tokenize once, one
    Generate per doc (linear), gram = space-joined token window."""
    d = (
        df.select(F.col(id_col).alias(out_id), tokens(text_col).alias("toks"))
        .filter(F.size("toks") >= k)
    )
    g = d.select(
        out_id,
        F.explode(
            F.sequence(F.lit(0), F.size("toks") - F.lit(k))
        ).alias("i"),
        "toks",
    )
    return g.select(
        out_id,
        F.concat_ws(" ", F.slice("toks", F.col("i") + 1, k)).alias("gram"),
    ).distinct()


def contamination_flags(
    corpus,
    benchmark,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_shared: int = 1,
):
    """Benchmark decontamination (the train/test-overlap gate every
    training-data pipeline needs): a corpus document is CONTAMINATED
    when it shares at least ``min_shared`` distinct ``k``-token word
    grams with ANY benchmark document.  Returns one row per corpus doc:
    (doc_id, n_shared_grams, contaminated).

    Scale: the benchmark side reduces to a DISTINCT gram set —
    benchmarks are tiny next to a 100 TB corpus, so it broadcasts and
    the corpus side is one tokenize + Generate + broadcast-hash-join
    + per-doc agg, no corpus-side shuffle beyond the count.  For a
    benchmark too big to broadcast, drop the hint and the same plan
    runs as a shuffle join on the gram key."""
    cg = _word_grams(corpus, text_col, id_col, "doc_id", k)
    bg = _word_grams(benchmark, text_col, id_col, "bench_id", k).select(
        "gram"
    ).distinct()
    counts = (
        cg.join(F.broadcast(bg), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_grams"))
    )
    base = corpus.select(F.col(id_col).alias("doc_id"))
    return base.join(counts, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_shared_grams", F.lit(0)).alias("n_shared_grams"),
        (F.coalesce("n_shared_grams", F.lit(0)) >= min_shared).alias(
            "contaminated"
        ),
    )


def tfidf_top_terms(
    docs,  # DataFrame
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
):
    """Top-k characteristic terms per document by tf-idf — the
    keyword-extraction / boilerplate-spotting primitive of corpus
    analytics.  The idf is the BM25 rational form WITHOUT the log:
    ``tf × (N − df + 0.5) / (df + 0.5)``.  Dropping the log keeps
    every arithmetic step a plain IEEE double op, so the score — and
    therefore the ranking — is bit-identical across engines (ln() is
    only 1-ulp-accurate and engine-specific, which can flip near-tie
    ranks); it is a monotone-in-df reweighting, not textbook lnidf,
    and is documented as such.

    Scale: tokenize+explode is one Generate; tf and df are two hash
    aggs; the join back is on term (broadcastable once df is computed
    at corpus scale the df side is |vocab|, tiny vs the corpus).  The
    only driver scalar is the document count.  Returns
    (id, rank, term, tf, df) with ties broken on term asc."""
    from pyspark.sql import Window

    tok = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("t")
    ).select(id_col, F.lower(F.col("t")).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = float(tf.select(id_col).distinct().count())
    scored = tf.join(dfreq, "term").withColumn(
        "score",
        F.col("tf").cast("double")
        * (F.lit(n_docs) - F.col("df").cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5)),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tf", "df")
    )


def source_drift_chi2(
    docs,  # DataFrame
    text_col: str = "text",
    group_col: str = "source",
    vocab_k: int = 1000,
    quantum: float = 1e12,
):
    """Distribution drift per group: the chi-square divergence
    ``Σ_t (p_t − q_t)² / q_t`` between each group's token distribution
    ``p`` and the corpus-wide distribution ``q``, over the top-k
    corpus vocabulary (freq desc, token asc tie-break — bounded and
    deterministic; tokens a group lacks contribute ``q_t``).
    Chi-square is used INSTEAD of KL deliberately: it detects the same
    shift but is pure rational arithmetic — no ln(), whose final-ulp
    is engine-specific and would make the score unverifiable
    cross-engine.  Terms are quantized (floor × quantum) and summed as
    integers, the same order-independent accumulation as
    ``graph.pagerank``.

    Scale: one tokenize+Generate, two hash aggs, a broadcast of the
    top-k vocab, one per-group sum.  Returns
    (group, n_tokens, chi2)."""
    from pyspark.sql import Window

    tok = docs.select(
        F.col(group_col).alias("grp"), F.explode(tokens(text_col)).alias("t")
    ).select("grp", F.lower(F.col("t")).alias("term"))
    term_grp = tok.groupBy("grp", "term").agg(F.count("*").alias("c"))
    term_all = term_grp.groupBy("term").agg(F.sum("c").alias("ct"))
    vocab = (
        term_all.orderBy(F.col("ct").desc(), F.col("term").asc())
        .limit(vocab_k)
    )
    total_all = vocab.agg(F.sum("ct")).collect()[0][0]  # scalar
    grp_tot = (
        term_grp.join(F.broadcast(vocab.select("term")), "term")
        .groupBy("grp")
        .agg(F.sum("c").alias("tg"))
    )
    # every (grp, vocab term) pair — absent terms contribute q_t
    grid = grp_tot.crossJoin(F.broadcast(vocab))
    cells = grid.join(term_grp, ["grp", "term"], "left").select(
        "grp", "tg", "ct",
        F.coalesce(F.col("c"), F.lit(0)).alias("c"),
    )
    p = F.col("c").cast("double") / F.col("tg").cast("double")
    q = F.col("ct").cast("double") / F.lit(float(total_all))
    term_val = (p - q) * (p - q) / q
    return (
        cells.withColumn("__q", F.floor(term_val * F.lit(quantum)))
        .groupBy("grp")
        .agg(
            F.max("tg").alias("n_tokens"),
            (F.sum("__q").cast("double") / F.lit(quantum)).alias("chi2"),
        )
        .select(F.col("grp").alias(group_col), "n_tokens", "chi2")
    )


def duplicate_span_stats(df, text_col: str = "text", id_col: str = "doc_id", k: int = 8):
    """Per-document duplicated-substring coverage, the shingle-marking
    approximation of suffix-array substring dedup (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): a
    token position is *duplicated* when the k-token shingle starting
    there occurs more than once in the whole corpus (across OR within
    documents); a document's duplicated-token count is the number of
    token positions covered by at least one duplicated shingle.

    Returns (doc_id, n_tokens, n_dup_tokens) — callers derive the
    fraction.  Scale shape: positions are linear in corpus tokens
    (one Generate per doc), the multiplicity count is a map-side
    combinable hash agg on an md5 key, and span coverage explodes a
    bounded k rows per duplicated position before a distinct on
    (doc, position).  No all-pairs stage anywhere — this survives a
    100 TB corpus where a literal suffix array would not.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    d = df.select(F.col(id_col).alias("__id"), tokens(text_col).alias("toks"))
    pos = (
        d.filter(F.size("toks") >= k)
        .select(
            "__id",
            F.explode(F.sequence(F.lit(0), F.size("toks") - F.lit(k))).alias("i"),
            "toks",
        )
        .select(
            "__id",
            "i",
            F.md5(
                F.concat_ws(" ", F.slice("toks", F.col("i") + 1, k)).cast("binary")
            ).alias("sh"),
        )
    )
    multiplicity = pos.groupBy("sh").agg(F.count(F.lit(1)).alias("c"))
    dup_pos = pos.join(multiplicity.filter(F.col("c") > 1), "sh").select("__id", "i")
    covered = (
        dup_pos.select(
            "__id",
            F.explode(F.sequence(F.col("i"), F.col("i") + F.lit(k - 1))).alias("p"),
        )
        .distinct()
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("n_dup_tokens"))
    )
    base = d.select("__id", F.size("toks").alias("n_tokens"))
    return (
        base.join(covered, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            "n_tokens",
            F.coalesce("n_dup_tokens", F.lit(0)).cast("long").alias("n_dup_tokens"),
        )
    )


def bm25_topk(
    docs,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
):
    """Full-text search: BM25-ranked top-k documents for a bag of
    query terms — the retrieval primitive next to
    :func:`tfidf_top_terms`'s extraction primitive, with the same
    log-free rational idf ``(N - df + 0.5) / (df + 0.5)`` (ln() is
    engine-specific at the last ulp; the rational form is a monotone
    surrogate, documented as such).

    Determinism: each (doc, term) partial score is an IEEE double
    expression evaluated identically cross-engine, then quantized with
    ``floor(score * 1e9)`` to an exact BIGINT before the per-doc sum —
    float sums depend on partition order, integer sums do not.  The
    quantized partials stay under 2^63 for corpora to ~1e10 docs;
    shrink the 1e9 quantum beyond that.  Ranking ties break on doc id.

    Scale: tokenize is one Generate; document length and term
    frequency are two hash aggs; df for the |query| terms is a tiny
    frame broadcast back; the final top-k is TakeOrderedAndProject,
    never a global sort.  Driver scalars: N and total token count.
    """
    query_terms = [t.lower() for t in query_terms]  # corpus terms are
    # lowercased below; an uppercase query term would silently match
    # nothing otherwise
    tok = docs.select(
        F.col(id_col).alias("__id"), F.explode(tokens(text_col)).alias("t")
    ).select("__id", F.lower(F.col("t")).alias("term"))
    dl = tok.groupBy("__id").agg(F.count(F.lit(1)).alias("dl"))
    totals = dl.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("total")
    ).collect()[0]
    n_docs, avgdl = float(totals["n"]), totals["total"] / totals["n"]
    tf = (
        tok.filter(F.col("term").isin(list(query_terms)))
        .groupBy("__id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    tf_d = F.col("tf").cast("double")
    df_d = F.col("df").cast("double")
    dl_d = F.col("dl").cast("double")
    idf = (F.lit(n_docs) - df_d + F.lit(0.5)) / (df_d + F.lit(0.5))
    tfn = (tf_d * (F.lit(k1) + F.lit(1.0))) / (
        tf_d
        + F.lit(k1)
        * (F.lit(1.0) - F.lit(b) + F.lit(b) * (dl_d / F.lit(avgdl)))
    )
    partial = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "__id")
        .select(
            "__id", F.floor((idf * tfn) * F.lit(1e9)).cast("long").alias("q")
        )
    )
    scored = partial.groupBy("__id").agg(F.sum("q").alias("score_q"))
    top = scored.orderBy(F.desc("score_q"), F.asc("__id")).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("score_q"), F.asc("__id"))
    return top.select(
        F.row_number().over(w).alias("rank"),
        F.col("__id").alias(id_col),
        (F.col("score_q").cast("double") / F.lit(1e9)).alias("score"),
    )


def _scoped_word_tokens(docs, text_col: str):
    """(doc_id?, w): lowercased whitespace tokens restricted to the
    BPE scope ``^[a-z]+$`` — ONE definition shared by the learn and
    apply paths so their tokenizations can never diverge."""
    cols = ["doc_id"] if "doc_id" in docs.columns else []
    return (
        docs.select(*cols, F.explode(tokens(text_col)).alias("raw"))
        .select(*cols, F.lower("raw").alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$"))
    )


def _bpe_vocab(scoped_words):
    """Distinct word forms with corpus frequency, as padded
    space-delimited symbol strings (' h e l l o ')."""
    return (
        scoped_words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.concat(
                F.lit(" "),
                F.array_join(F.split(F.col("w"), ""), " "),
                F.lit(" "),
            ).alias("sym"),
            "n",
        )
        # r13: LAZY — materialization fuses into round 1's pair-count
        # job instead of a separate driver-blocking job; consumers
        # after that read the materialized rows as before.
        .localCheckpoint(eager=False)
    )


def learn_bpe_merges(
    docs,
    n_merges: int = 3,
    text_col: str = "text",
):
    """Learn the first ``n_merges`` byte-pair-encoding merges from the
    corpus — the tokenizer-training step of an LLM data pipeline.
    Frequency BPE in the Sennrich et al. 2016 style: words become
    space-delimited symbol strings ("h e l l o"); each round counts
    adjacent symbol pairs weighted by word frequency (overlapping
    occurrences count, as in the original), merges the most frequent
    pair corpus-wide (ties broken lexicographically), and rewrites the
    vocabulary.  Only [a-z]+ word forms participate so symbols are
    regex-literal-safe.

    REWRITE VARIANT (documented divergence): the vocabulary rewrite is
    a single leftmost non-overlapping regex replace whose match
    consumes the shared delimiter, so in a run of 3+ identical
    mergeable pairs ("a a a a") merges land at alternating positions
    ("aa a a"), where the classic scan yields "aa aa".  Pair counting
    and argmax are unchanged; only merge placement inside
    same-symbol runs differs — rare in natural text and irrelevant to
    which merges get LEARNED on this corpus.  The oracle implements
    the identical variant, so the contract is exact.

    Returns one row per learned merge: (merge_rank, left_sym,
    right_sym, merged, pair_count).

    Determinism: pair counts are exact integer aggregates; the argmax
    is total-ordered by (count desc, left, right); the rewrite is a
    space-delimited non-overlapping regexp_replace, which scans
    left-to-right identically in every regex engine (no lookaround,
    no metacharacters).

    Scale: everything after the first word-count agg operates on the
    VOCABULARY (distinct word forms + counts), which is orders of
    magnitude smaller than the corpus — millions of rows at web
    scale, a frame per merge round, one narrow agg + a literal
    rewrite each; the only driver data is one argmax row per round.
    """
    scoped = _scoped_word_tokens(docs, text_col).select("w")
    merges, _ = _bpe_merge_rounds(_bpe_vocab(scoped), n_merges)
    spark = docs.sparkSession
    return spark.createDataFrame(
        spark.sparkContext.parallelize(merges, 1),
        "merge_rank int, left_sym string, right_sym string,"
        " merged string, pair_count bigint",
    )


def _bpe_merge_rounds(vocab, n_merges: int):
    """Run the merge rounds on a symbol vocabulary; returns the merge
    tuples learned (fewer than ``n_merges`` if pairs run out) and the
    rewritten vocabulary."""
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = (
            vocab.select(
                F.posexplode(F.split(F.trim("sym"), " ")).alias("i", "s"),
                "sym",
                "n",
            )
            .withColumn(
                "nxt",
                F.try_element_at(F.split(F.trim("sym"), " "), F.col("i") + 2),
            )
            .filter(F.col("nxt").isNotNull())
            .groupBy(F.col("s").alias("a"), F.col("nxt").alias("b"))
            .agg(F.sum("n").alias("c"))
        )
        top = pairs.orderBy(
            F.desc("c"), F.asc("a"), F.asc("b")
        ).limit(1).collect()
        if not top:
            break
        a, b, c = top[0]["a"], top[0]["b"], top[0]["c"]
        merges.append((rank, a, b, a + b, c))
        vocab = vocab.select(
            F.regexp_replace(
                "sym", f" {a} {b} ", f" {a}{b} "
            ).alias("sym"),
            "n",
        ).localCheckpoint(eager=False)  # r13: fuse into next round's job
    return merges, vocab


def bpe_token_stats(
    docs,
    n_merges: int = 3,
    text_col: str = "text",
):
    """Tokenizer APPLICATION — the other half of
    :func:`learn_bpe_merges`: learn ``n_merges`` merges from the
    corpus, then tokenize the corpus WITH them and report per-document
    BPE token counts and the chars-per-token compression ratio (the
    number every training-cost estimate and packing plan keys off).

    The trained tokenizer lives entirely in the rewritten VOCABULARY
    (word → post-merge symbol count) — applying it to the corpus is a
    hash join of corpus tokens against that map, never a per-document
    merge scan.  Only ``^[a-z]+$`` word forms participate (the learn
    contract): out-of-scope occurrences are EXCLUDED from all counts,
    and a document with no in-scope words is absent from the output.
    The corpus is tokenized ONCE — the same checkpointed (doc_id,
    word) frame feeds the vocabulary build and the per-document join.

    Raises ``ValueError`` on a corpus that yields fewer than
    ``n_merges`` learnable merges: the partially-merged vocabulary
    would silently tokenize with a different tokenizer than asked for
    (``learn_bpe_merges`` itself just returns the shorter merge list —
    its output states its own length; a token COUNT cannot).

    Determinism: symbol counts are exact integers off the identical
    rewrite the learn step performed; chars_per_token is one double
    division.
    """
    scoped = _scoped_word_tokens(docs, text_col).localCheckpoint(eager=False)
    merges, vocab = _bpe_merge_rounds(_bpe_vocab(scoped), n_merges)
    if len(merges) < n_merges:
        raise ValueError(
            f"bpe_token_stats: corpus yields only {len(merges)} of the "
            f"{n_merges} requested merges — token counts would come from "
            "a different tokenizer than asked for"
        )
    wmap = vocab.select(
        F.translate(F.trim("sym"), " ", "").alias("w"),
        F.size(F.split(F.trim("sym"), " ")).cast("bigint").alias("n_sym"),
    )
    return (
        scoped.join(wmap, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sym").cast("bigint").alias("n_bpe_tokens"),
            (
                F.sum(F.length("w").cast("bigint")).cast("double")
                / F.sum("n_sym").cast("double")
            ).alias("chars_per_token"),
        )
    )


def bigram_lm_scores(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 10**6,
):
    """Self-trained bigram language-model quality score per document —
    the perplexity-proxy filter of LLM data curation (reference has no
    analytics layer; this is north-star curation surface): train
    bigram statistics on the WHOLE corpus, then score each document by
    how predictable its word transitions are.  Atypical/garbled text
    gets a low score; templated/common text a high one.

    Determinism contract: no logs (perplexity's ``-Σ log p`` is
    engine-ulp-unstable), so the score is the fixed-point conditional
    probability itself — per bigram ``floor(scale * c(w1,w2) /
    c(w1,·))`` in pure BIGINT arithmetic, summed and integer-averaged
    per document.  Monotone in the geometric-mean-free LM quality and
    bit-identical in any engine.  Overflow headroom: ``scale *
    max_bigram_count < 2**63`` — the default 1e6 scale allows bigram
    counts to ~9e12 (far past 100 TB of text for a single bigram).

    Scale shape: explode to (doc, bigram) once; the MODEL is two
    map-side-combinable hash aggs (bigram counts, then history counts
    derived from the bigram table — never a second corpus pass); the
    scoring join is a uniform string-key equi-join against the model,
    then one hash agg per doc.  No windows, no driver state.
    """
    bg = df.select(
        F.col(id_col), F.explode(word_bigrams(text_col)).alias("bg")
    )
    big = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c_big"))
    hist = big.groupBy(
        F.substring_index("bg", " ", 1).alias("w1")
    ).agg(F.sum("c_big").alias("c_hist"))
    model = big.join(
        hist, F.substring_index(big["bg"], " ", 1) == hist["w1"]
    ).select(
        "bg",
        F.expr(f"CAST({scale} AS BIGINT) * c_big DIV c_hist").alias(
            "cond_scaled"
        ),
    )
    return (
        bg.join(model, "bg")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("cond_scaled").cast("long").alias("lm_sum_scaled"),
        )
        .withColumn(
            "avg_cond_prob_scaled",
            F.expr("lm_sum_scaled DIV n_bigrams"),
        )
    )
