"""Text-analysis operators over the ``documents`` table: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All pure Column expressions (JVM-side, codegen-friendly) — a 100 TB corpus
runs these as a single scan-project stage with zero shuffles and zero
Python. The stopword list is tiny and inlined as a literal array, never a
driver-side join.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Minimal English stopword set used by the quality and lang-id heuristics.
EN_STOPWORDS = ("a", "an", "and", "the", "of", "to", "in", "is", "it", "that")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization: array<string> of tokens."""
    return F.split(F.trim(_c(col)), r"\s+")


def chunk_token_windows(df, text_col: str = "text", id_col: str = "doc_id",
                        window: int = 64):
    """Sequence packing: split each document into fixed-size token windows
    (the pre-tokenizer chunking step of an LLM training pipeline) —
    (id, chunk_idx, chunk_text, n_tokens) with the last chunk ragged.

    Pure column arithmetic: the chunk structs are built INSIDE the
    token array's row with one ``F.transform`` over the chunk-index
    range, then exploded — a single scan-project stage, no shuffle,
    no Python; at 100 TB the chunk rows stream straight into the
    shard writer. Slicing before the explode matters (r17): the old
    shape exploded the index range first and sliced after, so the
    FULL token array rode along every chunk row — O(n_tokens^2 /
    window) bytes materialized per document, genuinely quadratic in
    document length for small windows. This shape peaks at O(doc) per
    input row and each output row carries only its own chunk."""
    toks = tokens(text_col)
    df2 = df.select(F.col(id_col), toks.alias("_toks"))
    n = F.size("_toks")
    n_chunks = F.ceil(n / F.lit(float(window))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.alias("chunk_idx"),
            F.array_join(
                F.slice("_toks", i * window + 1, F.lit(window)), " "
            ).alias("chunk_text"),
            F.least(F.lit(window), F.size("_toks") - i * window)
            .cast("int")
            .alias("n_tokens"),
        ),
    )
    return df2.select(
        F.col(id_col), F.explode(chunks).alias("_c")
    ).select(
        F.col(id_col),
        F.col("_c.chunk_idx").alias("chunk_idx"),
        F.col("_c.chunk_text").alias("chunk_text"),
        F.col("_c.n_tokens").alias("n_tokens"),
    )


def token_count(col: Column | str) -> Column:
    """Whitespace token count (BPE-ish refinement: see bpe_token_estimate)."""
    return F.size(tokens(col)).cast("bigint")


def bpe_token_estimate(col: Column | str) -> Column:
    """Rough BPE token estimate: count of word / digit / punctuation pieces
    (letters run together, digits count one-by-one, every symbol counts —
    the shape a byte-pair vocab converges to). A real tokenizer would be a
    pandas_udf over a vocab broadcast; this keeps the estimate JVM-side.
    The pattern is RE2-safe (no lookarounds) so any engine can replicate."""
    c = _c(col)
    return F.size(
        F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"), F.lit(0))
    ).cast("bigint")


def quality_features(col: Column | str) -> dict[str, Column]:
    """Quality-scoring feature family: lengths, punctuation / whitespace /
    stopword ratios. Each is one expression; combine into a score with any
    weighting downstream."""
    c = _c(col)
    toks = tokens(c)
    n_tokens = F.size(toks).cast("bigint")
    n_chars = F.length(c).cast("bigint")
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[.,!?;:]", ""))
    stop_hits = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(*EN_STOPWORDS))
    ).cast("bigint")
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": (n_punct.cast("double") / F.greatest(n_chars, F.lit(1))),
        "stopword_ratio": (stop_hits.cast("double") / F.greatest(n_tokens, F.lit(1))),
        "mean_token_len": (
            (n_chars - (n_tokens - 1)).cast("double") / F.greatest(n_tokens, F.lit(1))
        ),
    }


def language_id(col: Column | str, stop_threshold: int = 1) -> Column:
    """N-gram/stopword language-ID heuristic: English when enough English
    stopwords appear as whole tokens; Vietnamese when diacritic characters
    appear; else 'unknown'. Deliberately simple and fully SQL-expressible so
    the oracle can replicate it."""
    c = _c(col)
    stop_hits = F.size(F.filter(tokens(c), lambda t: F.lower(t).isin(*EN_STOPWORDS)))
    has_vi = c.rlike("[ạảấầẩẫậắằẳẵặẹẻẽềếểễệỉịọỏốồổỗộớờởỡợụủứừửữựỳỵỷỹđ]")
    return (
        F.when(has_vi, F.lit("vi"))
        .when(stop_hits >= stop_threshold, F.lit("en"))
        .otherwise(F.lit("unknown"))
    )


#: Conservative, lookaround-free patterns that Java regex and RE2 parse
#: identically — the portability constraint for oracle-checked redaction.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"


def repetition_features(col: Column | str, n: int = 3) -> dict[str, Column]:
    """Gopher-style within-document repetition signals: the fraction of
    n-gram OCCURRENCES that are duplicates of an earlier occurrence
    (0 = no repetition, ->1 = the doc is a loop). Boilerplate, template
    spam, and decoding loops score high and get filtered before training.
    Pure array arithmetic on one scan — no explode, no shuffle."""
    toks = tokens(col)
    cnt = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(cnt - n, F.lit(0)))
    grams = F.when(
        cnt >= n,
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")),
    ).otherwise(F.array(F.array_join(toks, " ")))
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    return {
        "n_grams": total.cast("bigint"),
        "n_distinct_grams": distinct.cast("bigint"),
        "dup_gram_ratio": (
            (total - distinct).cast("double") / F.greatest(total, F.lit(1))
        ),
    }


def redact_pii(col: Column | str) -> dict[str, Column]:
    """PII scrubbing (emails, URLs) with audit counts — the
    decontamination step a corpus pass applies before training. Counts
    come from regexp_extract_all; the redacted text is returned as an
    md5 digest column so downstream equality checks stay cheap (the full
    redacted text is one `regexp_replace` away with the same patterns)."""
    c = _c(col)
    # URL pass FIRST: a URL with userinfo (http://user@host/x) contains an
    # email-shaped substring, so redacting emails first would mutate the
    # URL and desynchronize the audit counts from the emitted tokens.
    # Counting n_urls on the original text and n_emails on the URL-redacted
    # stage makes each count equal the number of its token in the output.
    url_redacted = F.regexp_replace(c, URL_RE, "<URL>")
    redacted = F.regexp_replace(url_redacted, EMAIL_RE, "<EMAIL>")
    return {
        # group 0 = the full match (the patterns are group-free; Spark's
        # default idx=1 would error the moment a row actually matches)
        "n_emails": F.size(
            F.regexp_extract_all(url_redacted, F.lit(EMAIL_RE), 0)
        ).cast("bigint"),
        "n_urls": F.size(F.regexp_extract_all(c, F.lit(URL_RE), 0)).cast("bigint"),
        "redacted_digest": F.md5(redacted),
    }


def doc_fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 over whitespace-normalized,
    lowercased text. Stable across engines (md5 is identical in Spark and
    DuckDB), O(1) per row, and the join key for exact near-normalized dedup."""
    c = _c(col)
    return F.md5(F.lower(F.regexp_replace(F.trim(c), r"\s+", " ")))


def vocabulary(df, text_col: str = "text", id_col: str = "doc_id"):
    """Corpus vocabulary statistics: per lowercased token, total term
    frequency and document frequency. One explode + one hash aggregate —
    the canonical map-side-combinable corpus scan (tf is summed partially
    per partition before the shuffle on the uniform token key).

    ``id_col`` must be the real document key: a generated id would be
    evaluated per exploded row, inflating df to equal tf.
    """
    toks = df.select(
        F.col(id_col).alias("_doc"),
        F.explode(tokens(text_col)).alias("tok"),
    ).select(F.lower("tok").alias("token"), "_doc")
    return toks.groupBy("token").agg(
        F.count("*").cast("bigint").alias("tf"),
        F.countDistinct("_doc").cast("bigint").alias("df"),
    )


def novelty_features(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    rare_df: int = 1,
    pre_shingled=None,
):
    """Per-document corpus-relative novelty: of a doc's DISTINCT k-word
    shingles, how many have corpus document frequency <= ``rare_df``
    ("rare" — attested in no other document at the default). Returns
    (id, n_shingles, n_rare, novelty_ratio).

    The signal a curation pass reads two ways: ratio ~1 on a corpus of
    any size means content unattested elsewhere (OCR noise / gibberish,
    or genuinely novel text worth keeping for diversity — either way the
    rows a reviewer wants surfaced); ratio ~0 means boilerplate shared
    with many documents. Complements :func:`repetition_features`
    (WITHIN-doc duplication) with the ACROSS-corpus axis.

    Scale shape: one shuffle on the shingle string (the same uniform
    inverted-index key as the Jaccard join) for document frequencies,
    one join back, one per-doc aggregate. Exact integer counts and an
    int/int double division end-to-end — engine-portable, no RNG, no
    transcendental functions. ``pre_shingled`` reuses a materialized
    shingle projection (superset ok, left-semi restricted; same ``k``)
    exactly as :func:`..dedup.ngram_jaccard_pairs` does.
    """
    from .dedup import word_shingles

    if pre_shingled is not None:
        shingled = pre_shingled.select(F.col(id_col), "shingles").join(
            df.select(id_col), id_col, "left_semi"
        )
    else:
        shingled = df.select(
            F.col(id_col), word_shingles(text_col, k).alias("shingles")
        )
    postings = shingled.select(F.col(id_col), F.explode("shingles").alias("sh"))
    # word_shingles emits per-doc DISTINCT shingles, so count(*) per
    # shingle IS its document frequency — no countDistinct shuffle.
    dfreq = postings.groupBy("sh").agg(F.count("*").cast("bigint").alias("_df"))
    return (
        postings.join(dfreq, "sh")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_shingles"),
            F.sum((F.col("_df") <= rare_df).cast("bigint")).alias("n_rare"),
        )
        .withColumn(
            "novelty_ratio",
            F.col("n_rare").cast("double") / F.col("n_shingles"),
        )
    )


def ngram_counts(df, text_col: str = "text", n: int = 2):
    """Word n-gram frequency over the corpus (training-data n-gram stats /
    contamination screens). Shingle arrays are built per row JVM-side and
    exploded once; the count is a partial+final hash aggregate."""
    from .dedup import word_shingles

    grams = df.select(F.explode(word_shingles(text_col, n)).alias("ngram"))
    return grams.groupBy("ngram").agg(F.count("*").cast("bigint").alias("n"))


def unigram_lm(df, text_col: str = "text"):
    """Train a unigram language model over the corpus: (token, tf,
    logprob) with logprob = ln(tf / total). One explode + one hash
    aggregate (map-side combinable, uniform token keys); the total is a
    window-less scalar folded in via a 1-row cross join. The LM table is
    vocabulary-sized — orders of magnitude smaller than the corpus."""
    tok = df.select(F.explode(tokens(text_col)).alias("token")).filter(
        F.col("token") != ""
    )
    tf = tok.groupBy("token").agg(F.count("*").cast("bigint").alias("tf"))
    total = tf.agg(F.sum("tf").alias("_total"))
    return tf.crossJoin(F.broadcast(total)).select(
        "token",
        "tf",
        F.log(F.col("tf").cast("double") / F.col("_total").cast("double")).alias(
            "logprob"
        ),
    )


def lm_perplexity_scores(
    df,
    lm=None,
    text_col: str = "text",
    id_col: str = "doc_id",
    oov_logprob: float = -20.0,
):
    """CCNet-style quality scoring: each document's mean token logprob
    under a unigram LM (``lm=None`` self-trains on ``df`` via
    :func:`unigram_lm` — then every token is in-vocabulary; pass a
    reference-corpus LM to score a different corpus, with OOV tokens
    priced at ``oov_logprob``). Low scores flag gibberish/rare-token
    junk; implausibly high scores flag degenerate repetition — the
    standard two-sided perplexity filter of a web-corpus pipeline.

    Returns (id, n_tokens, sum_logprob, avg_logprob). Scale shape: one
    token explode, one token-keyed join against the vocabulary-sized LM
    (broadcast when it fits, shuffle-hash otherwise — token frequency
    skew is absorbed by the map-side combine of the following per-doc
    aggregate), one id-keyed hash aggregate."""
    if lm is None:
        lm = unigram_lm(df, text_col)
    tok = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("token")
    ).filter(F.col("token") != "")
    scored = tok.join(lm.select("token", "logprob"), "token", "left").select(
        id_col,
        F.coalesce("logprob", F.lit(float(oov_logprob))).alias("logprob"),
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.sum("logprob").alias("sum_logprob"),
        (F.sum("logprob") / F.count("*")).alias("avg_logprob"),
    )
