"""Text-analysis column functions for large-scale training-data
pipelines: tokenization, language-ID (stopword-vote heuristic), quality
scoring, document fingerprinting.

All are pure Catalyst column expressions (JVM-side, codegen-friendly —
no Python UDFs), so they run at full speed inside whole-stage codegen
and are SQL-expressible for the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic per-language stopword profiles (the operator is the
# vote mechanism; profiles are intentionally small and fixed).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "is", "and", "of"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "los", "y", "es", "una"],
    "zh": ["的", "是", "了", "在", "我"],
}

# deterministic tiebreak priority
_LANG_ORDER = ["en", "de", "fr", "es", "zh"]


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization of lowercased text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(c), " ")


def lang_scores(toks: Column) -> dict[str, Column]:
    """Per-language stopword hit counts."""
    def hits(words: list[str]):
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    return {lang: hits(words) for lang, words in LANG_STOPWORDS.items()}


def lang_id(text: Column | str) -> Column:
    """Argmax stopword vote with fixed tiebreak order; 'und' when all 0.

    Expression form — convenient for one-off use, but the tokenize
    subtree gets inlined into every per-language score by
    CollapseProject.  For corpus-scale scoring use ``lang_id_scored``,
    which tokenizes each document once (explode + conditional-count
    aggregates, map-side partial)."""
    toks = tokens(text)
    scores = lang_scores(toks)
    best = F.greatest(*[scores[lang] for lang in _LANG_ORDER])
    expr = F.lit("und")
    # build reversed so earlier languages win ties
    for lang in reversed(_LANG_ORDER):
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(
            expr
        )
    return expr


def _argmax_lang(score_col) -> Column:
    """when-chain argmax over the plain per-language score columns."""
    best = F.greatest(*[score_col(lang) for lang in _LANG_ORDER])
    expr = F.lit("und")
    for lang in reversed(_LANG_ORDER):
        expr = F.when((score_col(lang) == best) & (best > 0), F.lit(lang)).otherwise(
            expr
        )
    return expr


def lang_id_scored(docs, keep_cols=("doc_id",), text_col: str = "text"):
    """DataFrame-level language ID: returns ``keep_cols`` + per-language
    stopword scores ``s_<lang>`` + ``lang_pred``.  Tokenizes each doc
    ONCE (explode + 5 conditional-sum aggregates, partial map-side);
    the argmax when-chain then runs over plain int columns, so
    CollapseProject inlining is harmless.  ``split`` of any non-null
    string yields at least one element, so no document drops out."""
    tok = docs.select(
        *keep_cols, F.explode(tokens(text_col)).alias("tok")
    )
    aggs = [
        F.sum(
            F.when(F.col("tok").isin(*words), 1).otherwise(0)
        ).alias(f"s_{lang}")
        for lang, words in LANG_STOPWORDS.items()
    ]
    scored = tok.groupBy(*keep_cols).agg(*aggs)
    return scored.withColumn(
        "lang_pred", _argmax_lang(lambda lang: F.col(f"s_{lang}"))
    )


def quality_score(text: Column | str) -> Column:
    """0.4·min(1, n_tokens/100) + 0.3·stopword_ratio + 0.3·alpha_ratio,
    quantized to 4 decimals (heuristic doc-quality signal).

    Quantization is the engine-stable ``floor(x·1e4 + 0.5) / 1e4``
    form, NOT ``round(x, 4)``: Spark's round is exact-decimal while
    DuckDB's is scaled-float, and on a score whose double repr sits a
    hair below the .00005 boundary the two disagree by one final digit
    (first seen at the sf1 decade sweep, round 15 — 4 of 50 k docs).
    The floor form runs the identical double multiply-add-floor in
    both engines, so identical inputs can never quantize apart."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens(c)
    n_tokens = F.size(toks)
    all_stop = sorted({w for ws in LANG_STOPWORDS.values() for w in ws})
    arr = F.array(*[F.lit(w) for w in all_stop])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    stop_ratio = stop_hits / F.greatest(n_tokens, F.lit(1))
    alpha_ratio = F.length(F.regexp_replace(F.lower(c), "[^a-z]", "")) / F.greatest(
        F.length(c), F.lit(1)
    )
    len_score = F.least(F.lit(1.0), n_tokens / F.lit(100.0))
    raw = 0.4 * len_score + 0.3 * stop_ratio + 0.3 * alpha_ratio
    return F.floor(raw * 10000 + F.lit(0.5)) / 10000.0


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text."""
    c = F.col(text) if isinstance(text, str) else text
    normalized = F.trim(F.regexp_replace(F.lower(c), "\\s+", " "))
    return F.md5(normalized)


# GPT-2-style pretokenizer pattern, ASCII-simplified: contractions,
# letter runs, digit runs, punctuation runs — the "BPE-ish" split whose
# piece count tracks BPE token count far better than whitespace does.
BPE_ISH_PATTERN = "'[a-z]+|[a-z]+|[0-9]+|[^a-z0-9 ]+"


def bpe_ish_tokens(text: Column | str) -> Column:
    """Pretokenizer pieces of lowercased text (see BPE_ISH_PATTERN)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(F.lower(c), F.lit(BPE_ISH_PATTERN), 0)


def tfidf_top_terms(docs, id_col: str = "doc_id", text_col: str = "text", k: int = 3):
    """(doc_id, rn, term, tfidf) — top-k terms per document by
    tf·ln(N/df), deterministic tiebreak on term.

    Corpus-level stats stay distributed: df is a groupBy on term
    (partial-agg friendly), N rides along as a broadcast 1-row cross
    join — no driver-side collect.  Ranking orders by the ROUNDED
    score so the engine and the SQL oracle agree on ties."""
    from pyspark.sql import Window

    tok = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    ).filter(F.col("term") != "")
    tf = tok.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.select(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select(
            F.col(id_col),
            F.col("term"),
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(id_col, "rn", "term", "tfidf")
    )


def bm25_topk(
    docs,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 15,
    k1: float = 1.2,
    b: float = 0.75,
):
    """(doc_id, rn, bm25) — top-k documents for a bag-of-terms query
    under Okapi BM25 (Robertson et al.):
    ``idf(t)·tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))`` summed over query
    terms, with ``idf = ln(1 + (N-df+0.5)/(df+0.5))``.

    Scale shape: corpus statistics stay distributed — df and dl are
    partial-agg groupBys, avgdl and N ride along as broadcast 1-row
    cross joins; only rows containing a query term survive the tf
    filter, so the scored set is the posting-list union, not the
    corpus.  The cross-term sum is a FIXED-ORDER sum of per-term
    conditional-agg columns rather than a float groupBy sum — float
    addition isn't associative, and the fixed order is what lets a SQL
    oracle replay the score bit-for-bit.  Ranking orders by the
    ROUNDED score with a doc_id tiebreak (same convention as
    :func:`tfidf_top_terms`)."""
    from pyspark.sql import Window

    tok = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    ).filter(F.col("term") != "")
    dl = tok.groupBy(id_col).agg(F.count("*").alias("dl"))
    stats = dl.agg(
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl")
    )
    n = docs.select(F.count("*").alias("n_docs"))
    tf = (
        tok.filter(F.col("term").isin(list(query_terms)))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (
        F.lit(1 - b) + b * (F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(n))
        .select(
            F.col(id_col),
            "term",
            (idf * F.col("tf") * F.lit(k1 + 1) / denom).alias("sc"),
        )
    )
    per_term = [
        F.coalesce(
            F.max(F.when(F.col("term") == t, F.col("sc"))), F.lit(0.0)
        ).alias(f"s{i}")
        for i, t in enumerate(query_terms)
    ]
    agg = scored.groupBy(id_col).agg(*per_term)
    total = agg.columns[1:]
    score = F.col(total[0])
    for c in total[1:]:
        score = score + F.col(c)
    ranked = agg.select(
        F.col(id_col), F.round(score, 4).alias("bm25")
    )
    # top-k via orderBy+limit → TakeOrderedAndProject (per-partition
    # heaps + driver merge); the single-partition row_number window
    # then ranks only the k survivors, never the full scored set
    topk = ranked.orderBy(F.desc("bm25"), id_col).limit(k)
    w = Window.orderBy(F.desc("bm25"), id_col)
    return topk.withColumn("rn", F.row_number().over(w)).select(
        id_col, "rn", "bm25"
    )


def unigram_surprisal(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    broadcast_vocab: bool = False,
):
    """(doc_id, n_tokens, avg_surprisal) — mean token surprisal in nats
    under a unigram LM fit on the corpus itself: −ln(count(tok)/N),
    averaged per document.  This is the degenerate (order-0) form of
    CCNet/Gopher-style LM-perplexity quality filtering: documents full
    of corpus-typical tokens score low, gibberish and outliers score
    high — and unlike a real LM it needs no model artifact, stays fully
    deterministic, and is SQL-oracle-checkable.

    Scale shape: the vocabulary count table comes from one partial-agg
    friendly groupBy on token; the score join is token-keyed.  With
    ``broadcast_vocab=True`` the count table broadcasts (right only
    when the vocab fits in an executor — web-scale corpora have 10⁷⁺
    distinct tokens, so the default is the shuffle join, where hot
    stopword keys are exactly the skew AQE's skew-join splitting
    handles).  The corpus total N rides as a broadcast 1-row cross
    join, same as ``tfidf_top_terms``."""
    tok = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("tok")
    ).filter(F.col("tok") != "")
    cnt = tok.groupBy("tok").agg(F.count("*").alias("c"))
    if broadcast_vocab:
        cnt = F.broadcast(cnt)
    n = tok.select(F.count("*").alias("n_total"))
    return (
        tok.join(cnt, "tok")
        .crossJoin(F.broadcast(n))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.sum(-F.log(F.col("c") / F.col("n_total")))
                / F.count("*"),
                4,
            ).alias("avg_surprisal"),
        )
    )


def bigram_surprisal(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: float = 0.5,
):
    """(doc_id, n_bigrams, avg_nll, ppl) — mean bigram negative
    log-likelihood and perplexity under an add-k-smoothed bigram LM fit
    on the corpus itself: P(w2|w1) = (C(w1 w2)+k) / (C(w1)+k·V).

    One step up the n-gram ladder from :func:`unigram_surprisal` —
    word-ORDER now matters, so shuffled-word salad scores high even
    when its unigram profile is corpus-typical (the CCNet quality
    ladder's next rung, still model-artifact-free and deterministic).

    Scale shape: bigrams are built MAP-SIDE with ``zip_with`` over two
    slices of the token array (no positional self-join — that would
    inline the tokenization pipeline once per side); bigram and unigram
    count tables are partial-agg groupBys; V and the counts join
    token-keyed (AQE skew handling covers stopword heads, same note as
    unigram_surprisal)."""
    t = tokens(text_col)
    n = F.size(t)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(t, 1, n - 1),
            F.slice(t, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    big = docs.select(F.col(id_col), F.explode(bigrams).alias("bg"))
    uni = docs.select(F.explode(t).alias("w1"))
    c1 = uni.groupBy("w1").agg(F.count("*").alias("c1"))
    c2 = big.groupBy("bg").agg(F.count("*").alias("c2"))
    v = uni.agg(F.countDistinct("w1").alias("v"))
    p = (F.col("c2") + F.lit(k)) / (F.col("c1") + F.lit(k) * F.col("v"))
    scored = (
        big.withColumn("w1", F.split(F.col("bg"), " ")[0])
        .join(c2, "bg")
        .join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.sum(-F.log(p)) / F.count("*"), 4).alias("avg_nll"),
        )
    )
    return scored.withColumn("ppl", F.round(F.exp(F.col("avg_nll")), 2))


def char_entropy(text: Column | str) -> Column:
    """Shannon entropy (nats) of the character distribution of
    whitespace-normalized lowercase text — near-zero for repeated-char
    junk, high for natural text; a cheap gibberish/boilerplate tell
    computed entirely map-side (aggregate over the char frequency map,
    no shuffle)."""
    c = F.col(text) if isinstance(text, str) else text
    normalized = F.trim(F.regexp_replace(F.lower(c), "\\s+", " "))
    chars = F.filter(F.split(normalized, ""), lambda x: x != F.lit(""))
    n = F.size(chars)
    # char -> count map via aggregate over distinct chars
    freqs = F.transform(
        F.array_distinct(chars),
        lambda ch: F.size(F.filter(chars, lambda x: x == ch)) / n,
    )
    return F.round(
        F.aggregate(
            freqs, F.lit(0.0), lambda acc, p: acc - p * F.log(p)
        ),
        4,
    )


ROLLING_MOD = 1_000_003  # prime; keeps acc*31+c inside BIGINT


def rolling_fingerprint(text: Column | str) -> Column:
    """Polynomial rolling hash (Rabin-Karp: acc = acc*31 + code mod p)
    over the characters of whitespace-normalized lowercase text —
    engine-portable (same fold is expressible in SQL) and incremental
    (a streaming pipeline can extend it char-by-char)."""
    c = F.col(text) if isinstance(text, str) else text
    normalized = F.trim(F.regexp_replace(F.lower(c), "\\s+", " "))
    chars = F.split(normalized, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % ROLLING_MOD,
    )


def word_ngrams(text: Column | str, n: int = 2) -> Column:
    """ALL word n-grams of lowercased text, duplicates kept — the
    repetition-analysis counterpart of ``operators.dedup.word_shingles``
    (which deduplicates because set-similarity wants sets; repetition
    signals are precisely about the duplicates)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.lower(c), " ")
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_metrics(
    docs, id_col: str = "doc_id", text_col: str = "text", *, n: int = 2
):
    """(doc_id, n_ngrams, n_distinct, dup_frac, top_frac) — Gopher-style
    within-document repetition signals over word n-grams: dup_frac =
    fraction of n-gram occurrences that are repeats of an earlier one,
    top_frac = fraction covered by the single most frequent n-gram.
    High values flag boilerplate / degenerate documents for filtering.

    Shape: explode n-grams to rows, count per (doc, gram), aggregate
    per doc — two partial-aggregating groupBys keyed on doc_id, no
    joins; per-doc cost is linear in document length (an array-only
    formulation of top_frac would be quadratic for long docs).
    Documents shorter than ``n`` tokens have no n-grams and drop out,
    mirroring the SQL oracle's empty generate_series."""
    from ..operators.dedup import _spread

    # _spread: the n-gram explode is the CPU-heavy stage; an
    # under-partitioned source (one small parquet file) would run it on
    # one core.  No-op when the scan already yields enough splits.
    grams = _spread(docs, F.col(id_col)).select(
        F.col(id_col), F.explode(word_ngrams(text_col, n)).alias("gram")
    )
    per = grams.groupBy(id_col, "gram").agg(F.count("*").alias("c"))
    return per.groupBy(id_col).agg(
        F.sum("c").cast("bigint").alias("n_ngrams"),
        F.count("*").cast("bigint").alias("n_distinct"),
        F.round(F.lit(1) - F.count("*") / F.sum("c"), 4).alias("dup_frac"),
        F.round(F.max("c") / F.sum("c"), 4).alias("top_frac"),
    )


# PII scrubbing — deliberately simple ASCII patterns that parse the
# same way in Java regex (Spark) and DuckDB's RE2, so the oracle can
# mirror the scrub exactly.  Production would swap in a vetted library
# pattern set; the operator shape (regexp_count + chained
# regexp_replace, all JVM-side) is the deliverable.
PII_EMAIL = "[a-z0-9._-]+@[a-z0-9.-]+\\.[a-z]+"
PII_PHONE = "\\+1-[0-9]{3}-[0-9]{4}"
PII_IPV4 = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-document counts of each PII pattern."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        "n_emails": F.regexp_count(c, F.lit(PII_EMAIL)),
        "n_phones": F.regexp_count(c, F.lit(PII_PHONE)),
        "n_ips": F.regexp_count(c, F.lit(PII_IPV4)),
    }


def scrub_pii(text: Column | str) -> Column:
    """Redact emails → <EMAIL>, phones → <PHONE>, IPv4s → <IP>.
    Order matters: the email pattern must run before IPv4 (a dotted
    hostname tail could otherwise be half-eaten) — kept stable here
    and in the SQL oracle."""
    c = F.col(text) if isinstance(text, str) else text
    out = F.regexp_replace(c, PII_EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, PII_PHONE, "<PHONE>")
    return F.regexp_replace(out, PII_IPV4, "<IP>")


def pmi_collocations(
    docs,
    text_col: str = "text",
    *,
    min_count: int = 5,
    top_n: int = 20,
):
    """(w1, w2, n_pair, pmi) — top collocations by pointwise mutual
    information over ADJACENT token pairs:
    pmi = ln((c_ab/M) / ((c_a/N)·(c_b/N))), with N total tokens and M
    total adjacent pairs.  The classic corpus-linguistics signal for
    multiword expressions ("new york"), used in curation to build
    phrase vocabularies and to spot templated/boilerplate corpora
    (a few pairs with huge PMI mass).

    Scale shape: pair and unigram counts are partial-agg groupBys on
    the exploded streams; the two score joins are token-keyed (hot
    stopword keys are AQE-skew territory, same as unigram_surprisal);
    N and M ride as a broadcast 1-row cross join; the final top-n is a
    rounded-score TakeOrderedAndProject.  Ranking orders by the
    ROUNDED pmi (ties → pair lexicographic) so engines agree."""
    toks = F.filter(tokens(text_col), lambda t: t != "")
    w = docs.select(toks.alias("w")).filter(F.size("w") >= 2)
    pairs = w.select(
        F.explode(
            F.zip_with(
                F.slice("w", 1, F.size("w") - 1),
                F.slice("w", 2, F.size("w") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    uni = docs.select(F.explode(toks).alias("tok")).groupBy("tok").agg(
        F.count("*").alias("c")
    )
    pc = pairs.groupBy("w1", "w2").agg(F.count("*").alias("n_pair"))
    # totals derive from the two aggregates ALREADY built (N = Σ uni.c,
    # M = Σ pc.n_pair, summed BEFORE the min_count filter): the shared
    # groupBy exchanges are reused (ReusedExchange), so the corpus is
    # tokenized/exploded once per stream instead of twice
    totals = pc.agg(F.sum("n_pair").alias("m_pairs")).crossJoin(
        uni.agg(F.sum("c").alias("n_toks"))
    )
    c1 = uni.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))
    c2 = uni.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))
    pmi = (
        (F.col("n_pair") / F.col("m_pairs"))
        / ((F.col("c1") / F.col("n_toks")) * (F.col("c2") / F.col("n_toks")))
    )
    return (
        pc.filter(F.col("n_pair") >= min_count)
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "n_pair",
            F.round(F.log(pmi), 4).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(top_n)
    )
