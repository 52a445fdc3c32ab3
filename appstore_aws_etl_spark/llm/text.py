"""Text analysis operators: tokenization, word counts, TF-IDF, n-grams,
language ID, quality scoring, fingerprinting.

Mostly pure JVM expressions (split/explode/window/groupBy) — the hot
path stays inside whole-stage codegen. Round 10 MEASURED the tempting
exception and rejected it: a vectorized-Python tokenizer must return
array<string>, and marshalling per-token Python strings back through
Arrow costs ~25x the JVM regex split it replaces (see tokenize's
docstring). Python wins only where it returns something SMALL
(normalize_ascii_text's digest-bound strings, heavy_hitters_docs'
sketch rows, and — round 11 — keywords_topk's k rows per document).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tokenize(df: DataFrame, text_col: str = "text", out_col: str = "tokens") -> DataFrame:
    """Whitespace tokenization to an array column (fixture text is
    pre-normalized lowercase; real corpora would lower+strip first).

    Stays a JVM regex split DELIBERATELY (round-10 measured dead end:
    an Arrow-batched ``str.split`` UDF looked like the heavy_hitters
    win but returned ``array<string>`` — marshalling ~25M individual
    Python strings back through Arrow cost 77 s on a 100x tfidf run
    that the regex does in ~3 s. The vectorized-UDF exception pays off
    only when Python RETURNS something small — scalars, digests,
    sketch rows — never a per-token array; heavy_hitters_docs and
    normalize_ascii_text qualify, a tokenizer does not)."""
    return df.withColumn(out_col, F.split(F.lower(F.col(text_col)), r"\s+"))


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-wide token frequencies (explode -> two-phase count)."""
    return (
        tokenize(df, text_col)
        .select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def doc_freq_partials(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus document frequencies WITHOUT a (doc, term) exchange: one
    document-level Arrow pass emits per-partition df partials with
    C-level ``str.split`` (vocab-sized rows per task — Heaps'-law
    sub-linear in corpus size), then a vocab-sized term aggregation.
    The null-term row carries the document count. Token semantics
    mirror ``tokenize`` on the pre-normalized corpus (single-space
    lowercase; see tokenize's docstring). Shared by ``tfidf`` and
    ``keywords_topk`` — the r11 llm_keywords burn-down shape
    (AB_KEYWORDS_r11), generalized in r12 because llm_tfidf's df
    branch was paying a full exploded-corpus exchange for the same
    vocab-sized answer (4.1x DuckDB at the 100x tier)."""

    def df_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen: dict[str, int] = {}
        n_docs = 0
        for pdf in batches:
            for t in pdf[text_col]:
                n_docs += 1
                if t is None:
                    continue
                for tok in set(t.split()):
                    seen[tok] = seen.get(tok, 0) + 1
        if seen or n_docs:
            yield pd.DataFrame(
                {"term": list(seen) + [None],
                 "df_part": list(seen.values()) + [n_docs]}
            )

    return (
        df.select(text_col)
        .mapInPandas(df_partials, schema="term string, df_part long")
        .groupBy("term")
        .agg(F.sum("df_part").alias("df"))
    )


def tfidf(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-(doc, term) TF-IDF with the pinned smoothed formula
    ``tf * (ln((N+1)/(df+1)) + 1)`` (SURVEY.md §2.11 L7).

    Shuffle shape (reworked round 12; the r8 shape repartitioned the
    exploded corpus on the doc key and reused that full-size exchange
    for both the tf and df branches — still 4.1x DuckDB at the 100x
    tier because the df branch dragged the WHOLE corpus through the
    exchange even when the tf output is a doc slice): the df branch is
    now ``doc_freq_partials`` — a document-level Arrow pass whose
    exchange carries vocab-sized rows, never (doc, term) rows — and
    the tf branch is a plain explode + (doc, term) hash aggregation.
    Consequences at scale: (a) a downstream doc-slice filter (the
    llm_tfidf key keeps doc_id < 30) pushes through the tf aggregation
    to the SCAN, so the sliced query's only full-corpus work is the
    vocab-sized partials pass; (b) the unsliced query pays one
    (doc, term) exchange — its own output — plus a second corpus scan
    for the partials, which replaces the old plan's second full-size
    exchange consumer.

    The docfreq broadcast is vocab-bounded, not corpus-bounded —
    Heaps'-law sub-linear in corpus size, the same driver-side df
    vector Spark MLlib's own IDF collects. For an adversarial 100 TB
    vocabulary (billions of junk unique tokens) swap the broadcast for
    a plain shuffle join; the rest of the plan is unchanged.
    """
    partials = doc_freq_partials(df, text_col)
    # hapax guard (round-13; verdict watch item): only df >= 2 terms
    # enter the broadcast. EXACT, not approximate — a term absent from
    # the df>=2 relation has df exactly 1, because the (doc, term) row
    # scoring it contributes one document and a second document would
    # have lifted df to 2 and kept the term in the map. Hapax terms are
    # typically 40-60% of a natural vocabulary and the UNBOUNDED tail
    # of an adversarial one (URLs, typos, random strings), so the
    # broadcast is bounded by the recurring vocabulary, which is what
    # Heaps' law actually bounds.
    docfreq = partials.filter(F.col("term").isNotNull() & (F.col("df") >= 2))
    # the null-term partial row IS the document count (doc ids are
    # unique in the corpus contract, so row count == distinct ids)
    n_docs = partials.filter(F.col("term").isNull()).select(
        F.col("df").alias("n_docs")
    )
    tf = (
        tokenize(df, text_col)
        .select(id_col, F.explode("tokens").alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return (
        # bounded: docfreq is recurring-vocab-bounded (df>=2; hapax
        # terms resolve to df=1 via the coalesce below — exact)
        tf.join(F.broadcast(docfreq), "term", "left")
        .withColumn("df", F.coalesce(F.col("df"), F.lit(1).cast("long")))
        # bounded: 1-row corpus count
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf")
            * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1),
        )
        .select(id_col, "term", "tf", "df", "tfidf")
    )


def keywords_topk(
    df: DataFrame, k: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Top-k TF-IDF terms per document, document-level Arrow shape
    (round 11; verdict item 2 — the windowed plan over ``tfidf`` read
    8.12 s / 4.84x DuckDB at the 100x tier while plain tfidf ran 3.14 s,
    i.e. the JVM split + explode + (doc,term) exchange + full-table
    window sort IS the cost). This is ``heavy_hitters_docs``' two-pass
    pattern, which qualifies under the module's SMALL-output rule both
    times:

    * pass 1 streams raw text over Arrow and emits per-PARTITION
      document-frequency partials with C-level ``str.split`` —
      vocab-sized rows, never a (doc, term) exchange; a vocab-sized
      partial agg then lands the global df vector on the driver (the
      same Heaps'-law vocab-bounded parameter collect as ``tfidf``'s
      docfreq broadcast, shipped back as an sc.broadcast dict; for an
      adversarial 100 TB vocabulary swap pass 1's dict for the plain
      shuffle-join tfidf plan).
    * pass 2 re-tokenizes, scores tf * idf per document against the
      broadcast df dict, and emits ONLY the k winners — k rows per
      document, zero shuffles anywhere downstream of the df agg.

    Exactness: the 4dp rounding that orders the oracle's row_number
    replicates Spark's ``Round`` (BigDecimal.valueOf -> shortest
    decimal repr -> HALF_UP) via ``Decimal(repr(x))``, but Decimal is
    ~1us/call so it is NOT paid per term: rounding is monotone, so the
    multiset of rounded scores sorted desc equals rounding applied
    along the unrounded-desc order — the k-th largest rounded value is
    round(x_(k)), and only the prefix whose rounded score still equals
    or exceeds it (the candidates a rounding-tie could reorder by term)
    ever gets quantized, ~k + ties per document. Token semantics mirror
    ``tokenize`` on the pre-normalized corpus (single-space lowercase;
    see tokenize's docstring)."""
    import math
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    partials = doc_freq_partials(df, text_col)
    # bounded: RECURRING-vocab-sized parameter collect — the round-13
    # hapax guard keeps df==1 terms out of the driver map entirely
    # (same exactness argument as tfidf's docfreq filter: a term the
    # scorer can't find has df exactly 1, its own document being the
    # only contributor, so dfm.get(term, 1) below is exact). Hapax
    # terms are the unbounded tail of an adversarial 100 TB vocabulary;
    # what remains is the df>=2 vocabulary Heaps' law genuinely bounds.
    rows = partials.filter(F.col("term").isNull() | (F.col("df") >= 2)).collect()
    n_docs = sum(r["df"] for r in rows if r["term"] is None)
    df_map = {r["term"]: r["df"] for r in rows if r["term"] is not None}
    # bounded: vocab-sized df dict, shipped once per executor
    df_b = df.sparkSession.sparkContext.broadcast(df_map)
    quantum = Decimal("0.0001")

    def _round4(x: float) -> float:
        return float(Decimal(repr(x)).quantize(quantum, rounding=ROUND_HALF_UP))

    def topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dfm = df_b.value
        idf_cache: dict[int, float] = {}
        for pdf in batches:
            ids, terms, scores, rnks = [], [], [], []
            for doc_id, t in zip(pdf[id_col], pdf[text_col]):
                if t is None:
                    continue
                scored = []
                for term, tf in Counter(t.split()).items():
                    dfv = dfm.get(term, 1)  # absent == hapax, exact
                    idf = idf_cache.get(dfv)
                    if idf is None:
                        idf = math.log((n_docs + 1) / (dfv + 1)) + 1.0
                        idf_cache[dfv] = idf
                    scored.append((-tf * idf, term))
                if not scored:
                    continue
                scored.sort()
                if len(scored) > k:
                    # quantize only the rounding-tie frontier: every term
                    # whose rounded score >= round(x_(k)) could still beat
                    # the k-th pick on the (score desc, term asc) order
                    rk = _round4(-scored[k - 1][0])
                    n_cand = k
                    while n_cand < len(scored) and _round4(-scored[n_cand][0]) >= rk:
                        n_cand += 1
                    cand = sorted(
                        (-_round4(-s), term) for s, term in scored[:n_cand]
                    )[:k]
                else:
                    cand = [(-_round4(-s), term) for s, term in scored]
                for rnk, (neg_r, term) in enumerate(cand, 1):
                    ids.append(doc_id)
                    terms.append(term)
                    scores.append(-neg_r)
                    rnks.append(rnk)
            if ids:
                yield pd.DataFrame(
                    {id_col: ids, "term": terms, "tfidf": scores, "rnk": rnks}
                )

    return df.select(id_col, text_col).mapInPandas(
        topk, schema=f"{id_col} long, term string, tfidf double, rnk int"
    )


def ngrams(
    df: DataFrame, n: int = 2, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Sliding token n-grams with positions (lead-window construction so
    the per-doc ordering is explicit and deterministic)."""
    toks = tokenize(df, text_col).select(
        id_col, F.posexplode("tokens").alias("pos", "token")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    gram_parts = [F.col("token")] + [F.lead("token", i).over(w) for i in range(1, n)]
    out = toks.withColumn("__tail", F.lead("token", n - 1).over(w)).withColumn(
        "ngram", F.concat_ws(" ", *gram_parts)
    )
    # drop tail positions whose lookahead ran off the document (window
    # materialized as a column first — not allowed directly in WHERE)
    return out.filter(F.col("__tail").isNotNull()).select(id_col, "pos", "ngram")


# tiny per-language stopword anchors for the n-gram/stopword heuristic;
# chosen to be disjoint across the fixture's five languages
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "das"],
    "fr": ["le", "et", "les"],
    "es": ["el", "y", "los"],
    "zh": ["de", "shi", "le"],
}


def language_id(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heuristic language ID: score = count of language-marker tokens;
    argmax over languages with a fixed tie order. One pass, no shuffle
    — each doc scores independently (scales embarrassingly)."""
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    scores = [
        F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in markers]))).alias(
            f"score_{lang}"
        )
        for lang, markers in _LANG_MARKERS.items()
    ]
    scored = df.select(id_col, *scores)
    # deterministic argmax: greatest (score, -lang_rank) pair
    langs = list(_LANG_MARKERS)
    struct = F.greatest(
        *[
            F.struct(
                F.col(f"score_{lang}").alias("s"),
                F.lit(len(langs) - i).alias("r"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(langs)
        ]
    )
    return scored.withColumn("pred_lang", struct.getField("lang")).select(
        id_col, "pred_lang", *[f"score_{lang}" for lang in langs]
    )


def quality_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Pipeline-hygiene quality signals: length, token stats, stopword
    ratio, alpha ratio, repetition (distinct/total tokens)."""
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    stop = F.array(*[F.lit(s) for s in ("the", "and", "of", "a", "to", "in")])
    n_tok = F.size(toks)
    return df.select(
        id_col,
        F.length(text_col).alias("n_chars_m"),
        n_tok.alias("n_tokens"),
        F.round(F.length(F.regexp_replace(text_col, r"[^a-z ]", "")) / F.length(text_col), 4
                ).alias("alpha_ratio"),
        F.round(
            F.size(F.filter(toks, lambda t: F.array_contains(stop, t))) / n_tok, 4
        ).alias("stopword_ratio"),
        F.round(F.size(F.array_distinct(toks)) / n_tok, 4).alias("distinct_ratio"),
    )


def document_fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Canonical-form content fingerprint: collapse whitespace, md5.
    The join key for exact-content dedup across shards."""
    canon = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.select(
        id_col,
        F.md5(canon).alias("fingerprint"),
        F.sha2(canon, 256).alias("fingerprint_sha"),
    )


# Java-regex/RE2 common subset: the pattern must behave identically on
# the JVM (Spark) and RE2 (DuckDB oracle) — no backrefs, no lookaround.
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b"


def pii_redact(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "redacted",
) -> DataFrame:
    """PII scrubbing pass: replace email addresses and phone-shaped
    numbers with typed placeholder tokens, reporting per-document match
    counts. Pure JVM regex — embarrassingly parallel, no shuffle; the
    patterns stay inside the Java/RE2 common subset so the DuckDB
    oracle reproduces them byte-for-byte."""
    emails = F.size(F.regexp_extract_all(text_col, F.lit(EMAIL_RE), 0))
    phones = F.size(F.regexp_extract_all(text_col, F.lit(PHONE_RE), 0))
    scrubbed = F.regexp_replace(
        F.regexp_replace(text_col, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return df.select(
        id_col,
        emails.alias("n_emails"),
        phones.alias("n_phones"),
        F.md5(scrubbed).alias(f"{out_col}_md5"),
        (emails + phones > 0).alias("was_redacted"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_chars: int = 200,
    stride: int = 150,
) -> DataFrame:
    """Overlapping fixed-size character chunking — the pre-tokenization
    split step of a training pipeline (chunk i covers
    [i*stride, i*stride + chunk_chars)).

    Scale shape: pure per-row explode, no shuffle; chunk count is
    ceil(len/stride) so output size is bounded by a constant factor of
    input bytes regardless of document-length skew.
    """
    n = F.length(F.col(text_col))
    n_chunks = F.ceil(n / F.lit(float(stride))).cast("long")
    return df.select(
        id_col,
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("_p", "chunk_id"),
        F.col(text_col),
    ).select(
        id_col,
        "chunk_id",
        F.substring(
            F.col(text_col), F.col("chunk_id") * stride + 1, chunk_chars
        ).alias("chunk_text"),
    )


def repetition_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signal: the fraction of a document's
    tokens taken by its single most frequent token. High values flag
    degenerate/boilerplate text for corpus filtering.

    Scale shape: explode -> per-(doc, token) count -> per-doc ratio;
    both aggregations key on doc_id so the second reuses the first's
    partitioning (one logical shuffle over token-exploded rows).
    """
    tok = df.select(id_col, F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("token"))
    cnt = tok.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("c"))
    return cnt.groupBy(id_col).agg(
        (F.round(F.max("c") / F.sum("c"), 4) + F.lit(0.0)).alias("top_token_ratio")
    )
