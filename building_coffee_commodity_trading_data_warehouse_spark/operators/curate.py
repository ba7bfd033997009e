"""Dataset-curation operators a training-data pipeline needs between
"deduplicated corpus" and "training shards": deterministic train/val/
test splitting, deterministic sampling, and fixed-window document
chunking.

All assignment is CONTENT-ADDRESSED (md5 of the id, no RNG state): a
document's split/sample fate depends only on its id and the seed, so
it is reproducible across runs, stable when the corpus grows (new docs
never reshuffle old assignments — the property that keeps eval sets
uncontaminated across dataset versions), and needs no driver-side
state, ordering, or sampling RNG. Everything is a pure projection /
filter — no shuffle at all, embarrassingly parallel at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2^32 buckets from the first 8 hex chars of md5 — uniform enough that
# split ratios hold to ~1e-4 at corpus scale.
_BUCKETS = 1 << 32


def hash_bucket(id_col: Column, seed: str) -> Column:
    """Deterministic uniform bucket in [0, 2^32): first 8 md5 hex chars
    of ``seed|id``. Portable: identical bytes on any engine with md5."""
    h = F.md5(F.concat(F.lit(f"{seed}|"), id_col.cast("string")).cast("binary"))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    seed: str = "split",
) -> DataFrame:
    """Adds a ``split`` column assigning each row to train/val/test by
    cumulative weight over the hash bucket. Assignment is a function of
    (seed, id) only — growing the corpus never moves an existing row
    between splits."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    bucket = hash_bucket(F.col(id_col), seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = bucket < int(acc * _BUCKETS)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn("split", expr)


def hash_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id", seed: str = "sample"
) -> DataFrame:
    """Deterministic ``fraction`` sample: keep rows whose bucket falls
    below fraction·2^32. Unlike ``df.sample`` this is reproducible
    across runs/partitionings and composable (nested fractions nest)."""
    return df.filter(hash_bucket(F.col(id_col), seed) < int(fraction * _BUCKETS))


def chunk_documents(
    documents: DataFrame, chunk: int = 64, stride: int = 48
) -> DataFrame:
    """Fixed-window chunking with overlap (context-window packing for
    training / RAG): whitespace tokens → windows of ``chunk`` tokens
    every ``stride`` tokens, tail windows shorter. One generator
    expression (sequence + explode + slice) — array-native, no Python,
    output rows ≈ n_tokens/stride per doc. Chunk ids are derived from
    the window start, so re-chunking a changed document is locally
    idempotent.

    The tokenization is PROJECTED FIRST into its own step: aliasing
    the split in the same select as the explode leaves Catalyst
    re-evaluating ``split(text)`` inside the Generate's sequence
    bound AND in the downstream project (2 splits/row, no CSE across
    the Generate boundary — measured 2.1x the whole operator at
    sf0.1, SCALE.md round-10)."""
    if stride <= 0 or chunk <= 0:
        raise ValueError("chunk and stride must be positive")
    toks_df = documents.select(
        "doc_id", F.split("text", r"\s+").alias("_toks")
    )
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("_toks") - 1, F.lit(0)), F.lit(stride)
    )
    return (
        toks_df.select("doc_id", "_toks", F.explode(starts).alias("_start"))
        .select(
            "doc_id",
            (F.col("_start") / stride).cast("long").alias("chunk_id"),
            F.least(F.lit(chunk), F.size("_toks") - F.col("_start")).cast("long").alias(
                "n_tokens"
            ),
            F.concat_ws(" ", F.slice("_toks", F.col("_start") + 1, chunk)).alias(
                "chunk_text"
            ),
        )
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    id_col: str = "doc_id",
    seed: str = "strat",
) -> DataFrame:
    """Per-stratum deterministic sampling (rebalancing a training mix:
    keep 100% of rare strata, downsample dominant ones). Same
    content-addressed bucket as ``hash_sample``; only the threshold
    varies by stratum, so the predicate stays a pure filter — no
    shuffle, no per-group state, stable under corpus growth. Strata
    absent from ``fractions`` fall back to ``default_fraction``."""
    bucket = hash_bucket(F.col(id_col), seed)
    thr: Column | None = None
    for val, frac in fractions.items():
        cond = F.col(strata_col) == val
        t = F.lit(int(frac * _BUCKETS))
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    default = F.lit(int(default_fraction * _BUCKETS))
    thr = default if thr is None else thr.otherwise(default)
    return df.filter(bucket < thr)


def pack_chunks(
    chunks: DataFrame,
    max_tokens: int,
    shard_col: str = "shard",
    order_cols: tuple[str, str] = ("doc_id", "chunk_id"),
    token_col: str = "n_tokens",
) -> DataFrame:
    """Concat-and-chunk sequence packing (LLM pretraining shard
    assembly): chunks are laid end-to-end in deterministic order within
    each shard and a chunk belongs to the pack its START offset falls
    in — ``pack_id = floor(offset / max_tokens)`` — so packs are filled
    back-to-back and a chunk may straddle a boundary, exactly like the
    standard concat-then-slice pretraining pipeline.

    One running-sum window PER SHARD: the shard column is the
    parallelism unit (a global pack order would serialize into one
    task at 100 TB — shard first, e.g. by ``hash_split`` or date, then
    pack within shards)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(shard_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(token_col).over(w)
    offset = (cum - F.col(token_col)).cast("long")
    return chunks.select(
        "*",
        offset.alias("pack_offset"),
        F.floor(offset / F.lit(max_tokens)).cast("long").alias("pack_id"),
    )


def quality_filter(
    documents: DataFrame,
    min_tokens: int = 20,
    max_punct_ratio: float = 0.3,
    min_distinct_ratio: float = 0.4,
) -> DataFrame:
    """Corpus quality gate (the filter step a pretraining pipeline runs
    after dedup): keep documents whose length / punctuation-density /
    lexical-diversity scores clear the thresholds, returning survivors
    WITH their scores. Pure projection + filter over the textstats
    scoring pass — no join, no shuffle; the metrics are computed once
    inline and the predicate is pushed into the same stage."""
    from building_coffee_commodity_trading_data_warehouse_spark.operators.textstats import (
        quality_and_language,
    )

    q = quality_and_language(documents)
    return q.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("punct_ratio") <= max_punct_ratio)
        & (F.col("distinct_ratio") >= min_distinct_ratio)
    )


def temperature_mix(documents: DataFrame, by: str = "lang") -> DataFrame:
    """Temperature-based sampling mix (T=2, i.e. count^(1/2)) across
    languages — the standard rebalancing step for multilingual
    pretraining corpora: raw frequency under-trains tail languages, so
    sampling weights flatten counts through a sub-linear power before
    normalizing. sqrt keeps every arithmetic step correctly rounded
    (IEEE sqrt + division), and the cross-group normalizer accumulates
    in DECIMAL, so the weights are bit-identical on any engine and any
    partitioning — no libm pow in sight.

    Scale shape: one groupBy on the stratum key (#strata rows out),
    then a 1-row global total broadcast back — nothing funnels through
    a single-partition window, nothing corpus-sized leaves the
    executors."""
    wd = F.sqrt(F.col("n_docs")).cast("decimal(38,12)")
    counts = documents.groupBy(F.col(by).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_docs")
    ).withColumn("__wd", wd)
    totals = counts.agg(
        F.sum("__wd").alias("__tw"), F.sum("n_docs").alias("__tn")
    )
    share = F.col("__wd").cast("double") / F.col("__tw").cast("double")
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "stratum",
            "n_docs",
            share.alias("sample_weight"),
            (share * F.col("__tn")).alias("expected_docs"),
        )
    )


# Conservative PII patterns, chosen to parse identically in Java
# (Spark) and RE2-flavored (DuckDB) regex dialects: plain character
# classes and bounded quantifiers only — no lookaround, no backrefs.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_URL = r"https?://[^\s]+"
PII_PHONE = r"\+[0-9][0-9()\- ]{7,}[0-9]"


def pii_scrub(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction — the compliance pass every pretraining corpus
    runs before anything else: emails, URLs, and international-format
    phone numbers are replaced by typed placeholder tokens, with
    per-document match counts kept for audit.

    Everything is native regexp_replace/regexp_count over one
    projection: no shuffle, no UDF, scan-parallel at any corpus size;
    the cleaned text is returned alongside an md5 so audits can
    content-address results without re-reading documents. Order of
    application matters and is fixed: URLs first (an email-looking
    userinfo inside a URL must redact as part of the URL), then
    emails, then phones — and each count is taken on the text AFTER
    the previous pass, so the audit counts equal the number of
    placeholders actually emitted (counting the raw text would report
    an email that was in fact swallowed by its enclosing URL)."""
    t = F.col(text_col)
    after_url = F.regexp_replace(t, PII_URL, "<URL>")
    after_email = F.regexp_replace(after_url, PII_EMAIL, "<EMAIL>")
    clean = F.regexp_replace(after_email, PII_PHONE, "<PHONE>")
    return documents.select(
        "doc_id",
        F.regexp_count(t, F.lit(PII_URL)).alias("n_urls"),
        F.regexp_count(after_url, F.lit(PII_EMAIL)).alias("n_emails"),
        F.regexp_count(after_email, F.lit(PII_PHONE)).alias("n_phones"),
        clean.alias("clean_text"),
        F.md5(clean.cast("binary")).alias("clean_md5"),
    )


def boilerplate_scrub(
    documents: DataFrame,
    text_col: str = "text",
    max_doc_frac: float = 0.5,
    max_stop_tokens: int = 1024,
) -> DataFrame:
    """Corpus-frequency boilerplate removal — the token-level analog of
    C4/RefinedWeb line dedup: tokens that occur in more than
    ``max_doc_frac`` of all documents (navigation chrome, cookie
    banners, licence headers in a real web corpus) are struck from
    every document, and the cleaned text plus kept/dropped counts are
    returned for each document.

    Scale shape — the corpus is NEVER shuffled on doc_id:
      * one token-keyed aggregate computes document frequency (distinct
        tokens per doc exploded, so a plain count(1) is the doc count);
      * the corpus size joins in as a broadcast 1-row aggregate, so the
        threshold is dataflow-computed — no driver-side count();
      * the stop list is provably tiny (Zipf: tokens in >half of all
        documents number in the hundreds at web scale) and additionally
        hard-bounded by ``max_stop_tokens`` top-df (token-tiebroken), so
        collecting it into ONE array row and broadcasting is safe at any
        corpus size — the same inversion that fixed the n-gram join
        strategy (dedup._drop_stop_shingles);
      * cleanup itself is a pure projection: array filter against the
        broadcast stop array + array_join, fully codegen, no UDF.

    Leading/trailing whitespace would make split() emit phantom ''
    tokens (corrupting counts and stealing stop-list slots), so
    zero-length tokens are filtered out on both engines.
    """
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
    )
    per_doc = documents.select("doc_id", toks.alias("__toks"))
    total = documents.agg(F.count(F.lit(1)).alias("__n_docs"))
    doc_freq = (
        per_doc.select(F.explode(F.array_distinct("__toks")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
    )
    stop_row = (
        doc_freq.crossJoin(F.broadcast(total))
        .filter(F.col("doc_freq") > F.col("__n_docs") * F.lit(max_doc_frac))
        .orderBy(F.col("doc_freq").desc(), "token")
        .limit(max_stop_tokens)
        .agg(F.collect_list("token").alias("__stop"))
    )
    kept = F.filter(
        F.col("__toks"), lambda t: ~F.array_contains(F.col("__stop"), t)
    )
    return per_doc.crossJoin(F.broadcast(stop_row)).select(
        "doc_id",
        F.array_join(kept, " ").alias("clean_text"),
        F.size(kept).alias("n_kept"),
        (F.size("__toks") - F.size(kept)).alias("n_dropped"),
    )


def group_sample(
    df: DataFrame,
    k: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "group-sample",
) -> DataFrame:
    """Exact-k deterministic sample per group — eval-set construction
    ("5 held-out docs per source") needs exactly k rows per group, which
    fraction-based hash_sample cannot promise. Rows are ranked inside
    each group by their content-addressed hash bucket (seeded md5, no
    RNG) with the id as tiebreak, so the chosen k are a uniform,
    reproducible draw that never changes when OTHER groups grow.

    Scale shape: one exchange on the group key. The ``row_number ≤ k``
    filter is pushed down as a partial WindowGroupLimit (pinned in
    tests), so every map task forwards at most k rows per group to the
    shuffle — a giant group costs its scan, not its sort."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        hash_bucket(F.col(id_col), seed), F.col(id_col)
    )
    return df.withColumn("sample_rank", F.row_number().over(w)).filter(
        F.col("sample_rank") <= k
    )


def winsorize(
    events: DataFrame, group_col: str = "event_type", k: str = "1.5"
) -> DataFrame:
    """Tukey-fence winsorization per group: values outside
    [q1 − k·IQR, q3 + k·IQR] clip to the fence — the standard outlier
    clamp before a numeric column feeds normalization or training.

    Engine-exact decision: the quartiles land on an (at most) 4-decimal
    lattice (binary-fraction interpolation of 2-decimal ticks), so both
    fences are computed in DECIMAL after one cast — every comparison
    and clip happens on exact decimals, never raw doubles, and the
    clipped value is bit-identical on any engine. Scale shape: the
    fence table is one row per group (a groupBy on the tiny group key),
    broadcast back — the event stream itself is never shuffled."""
    d = F.col("value").cast("decimal(18,2)")
    kd = F.lit(k).cast("decimal(6,3)")
    fences = events.groupBy(group_col).agg(
        F.percentile("value", 0.25).cast("decimal(18,4)").alias("__q1"),
        F.percentile("value", 0.75).cast("decimal(18,4)").alias("__q3"),
    )
    iqr = F.col("__q3") - F.col("__q1")
    lo = F.col("__q1") - kd * iqr
    hi = F.col("__q3") + kd * iqr
    return (
        events.join(F.broadcast(fences), group_col)
        .select(
            "event_id",
            group_col,
            "value",
            F.least(F.greatest(d, lo), hi).cast("double").alias("clipped"),
            ((d < lo) | (d > hi)).alias("was_clipped"),
        )
    )


# one character class covering C0 control chars (minus \t\n\r, which
# are whitespace and belong to the collapse pass), DEL, and the
# zero-width code points (ZWSP/ZWNJ/ZWJ/BOM). \x{...} syntax parses
# identically in Java regex (Spark) and RE2 (DuckDB).
_STRIP_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F\x{200B}-\x{200D}\x{FEFF}]"
# whitespace runs INCLUDING NBSP collapse to one plain space. \s is
# ASCII-only in both engines once \x0B is stripped above (Java's \s
# covers \x0B, RE2's does not — pass 1 removes the divergence).
_WS_RE = r"[\s\x{00A0}]+"


def clean_text(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Unicode hygiene pass — the first projection of every web-corpus
    pipeline: strip control and zero-width characters (C0 minus
    tab/newline, DEL, ZWSP/ZWNJ/ZWJ/BOM), fold NBSP into plain space,
    collapse whitespace runs, and trim. Zero-width stripping matters
    for dedup (two visually identical documents differing by a ZWSP
    hash apart); control stripping protects downstream CSV/JSON sinks.

    Pure projection: two regexp_replace passes + trim, whole-stage
    codegen, no shuffle, no UDF — the plan scans 100 TB as a map-only
    stage. Both regexes use ``\\x{...}`` escapes that parse identically
    in Java regex and RE2, so the DuckDB oracle replays it verbatim.
    """
    raw = F.col(text_col)
    stripped = F.regexp_replace(raw, _STRIP_RE, "")
    collapsed = F.trim(F.regexp_replace(stripped, _WS_RE, " "))
    return documents.select(
        "doc_id",
        collapsed.alias("clean_text"),
        F.length(raw).cast("long").alias("n_chars_raw"),
        F.length(collapsed).cast("long").alias("n_chars_clean"),
    )


def dsir_importance(
    documents: DataFrame,
    target_sources: list[str],
    text_col: str = "text",
) -> DataFrame:
    """Data Selection with Importance Resampling (DSIR, Xie et al.
    2023) scores, log-free: rank raw documents by how target-like
    their token distribution is, so a pipeline can resample a 100 TB
    crawl toward a small high-quality target domain. The target here
    is the subset of ``documents`` whose source is in
    ``target_sources``; features are unigram tokens with add-one
    smoothing.

    Engine-exact scoring without ``ln``: the classical DSIR weight is
    exp Σ count_f · log(p_target(f)/p_raw(f)); libm logs differ in the
    last ulp across engines, so — like tfidf_top_terms' rational idf —
    the score stays in the LINEAR domain: importance = (Σ_f count_f ·
    ratio_f) / n_tokens where ratio_f = ((c_t(f)+1)/(c_r(f)+1)) ·
    ((R+V)/(T+V)). Every operand is an exact integer count; each
    ratio is two correctly-rounded IEEE divisions and one multiply;
    the per-doc fold floor-quantizes each term onto the 2^-20 lattice
    (×2^20 is exact, floor is exact) and sums BIGINTs — associative,
    so bit-identical on any engine, any partitioning. (No decimal
    cast of the raw double — a dyadic ratio can land exactly on a
    half-decimal tie, which Spark rounds HALF_UP and DuckDB
    HALF_EVEN; and no cross-multiplied products — (c+1)·(R+V) would
    exceed 2^53 at corpus scale and round.)

    Plan: one token explode → per-(doc, term) counts (map-side
    combinable); per-term target/raw counts fold from the SAME frame;
    the three corpus scalars (T, R, V) collapse to ONE broadcast row;
    the only vocabulary-sized shuffle is the per-(doc, term) ⋈
    per-term equi-join on the term key. Nothing corpus-sized reaches
    the driver."""
    is_target = F.col("source").isin(*target_sources)
    # filter phantom '' tokens from whitespace-padded text BEFORE the
    # explode (split() emits them at string edges — the same hazard
    # boilerplate_scrub documents); a '' vocabulary term would skew
    # every padded document's n_tokens and ratio.
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
    )
    exploded = documents.select(
        "doc_id", is_target.alias("__t"), F.explode(toks).alias("term")
    )
    from pyspark.sql import Window

    from ..caching import scoped_persist

    # the explode+count feeds both consumers (scored pass, corpus
    # scalars) — persist once or the 100 TB token explode runs twice.
    per_doc_term = scoped_persist(
        exploded.groupBy("doc_id", "__t", "term").agg(
            F.count(F.lit(1)).alias("cnt")
        )
    )
    # corpus scalars straight off the per-(doc, term) counts: tot_r =
    # Σcnt, tot_t = Σcnt over target rows, vocab = distinct terms —
    # identical values to folding a per-term table first (exact
    # integer sums are associative), without building that table.
    scalars = per_doc_term.agg(
        F.sum("cnt").alias("__sc_r"),
        F.sum(F.when(F.col("__t"), F.col("cnt")).otherwise(F.lit(0))).alias(
            "__sc_t"
        ),
        F.countDistinct("term").alias("__sc_v"),
    )
    # per-term target/raw counts as WINDOW sums over the SAME
    # term-keyed exchange the scored join needed anyway (r15, guide
    # §2.4: two operations keyed the same way share one exchange) —
    # the r14 plan shuffled per_doc_term by term AND shuffled +
    # persisted a separate per_term table, then equi-joined the two
    # (4 exchanges, 2 persisted frames, 6 driver jobs); this plan is
    # explode-agg → one term window → doc rollup (3 exchanges, 1
    # persisted frame, ~4 jobs). Same exact-integer sums, so the
    # score is bit-identical; at scale the window shuffles the same
    # (doc, term) rows the join's left side did, minus the extra
    # per-term table shuffle.
    wterm = Window.partitionBy("term")
    ratio = (
        (F.col("c_t") + 1).cast("double") / (F.col("c_r") + 1).cast("double")
    ) * (
        (F.col("__sc_r") + F.col("__sc_v")).cast("double")
        / (F.col("__sc_t") + F.col("__sc_v")).cast("double")
    )
    scored = (
        per_doc_term.select(
            "*",
            # both sums in ONE select so they land in a single Window
            # node (chained withColumn interposes a Project that
            # defeats CollapseWindow — pinned by test_plan_shapes)
            F.sum("cnt").over(wterm).alias("c_r"),
            F.sum(
                F.when(F.col("__t"), F.col("cnt")).otherwise(F.lit(0))
            ).over(wterm).alias("c_t"),
        )
        .join(F.broadcast(scalars))
        .select(
            "doc_id",
            "cnt",
            F.floor(F.col("cnt").cast("double") * ratio * F.lit(float(1 << 20)))
            .cast("long")
            .alias("__wq"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.sum("__wq").alias("__wsum"),
        )
        .select(
            "doc_id",
            "n_tokens",
            (
                (F.col("__wsum").cast("double") / F.lit(float(1 << 20)))
                / F.col("n_tokens")
            ).alias("importance"),
        )
    )


def linear_score(
    documents: DataFrame,
    weights: list[int],
    scale: int = 1000,
    bias: int = 0,
    threshold: float = 0.0,
) -> DataFrame:
    """fastText-style linear quality classifier applied at corpus
    scale: each token's hashing-trick feature (bucket, ±1 sign —
    textstats.hashed_token_features) looks its weight up in the
    broadcast model and the per-doc score is the length-normalized
    mean contribution. This is the "apply a trained filter model to
    100 TB" step of a curation pipeline (the trained weights arrive
    as a plain list, ``scale`` fixed-point units per 1.0).

    Exactness + scale: weights are INTEGERS on the 1/scale lattice, so
    the per-doc accumulation is one BIGINT sum — associative, exact,
    map-side combinable; the model rides along as an array literal
    indexed by ``element_at`` (no join, nothing driver-side at query
    time). score = (bias + Σ s·w[b]) / (scale·n_tokens): the product
    of two exact integers then ONE IEEE division — bit-identical on
    any engine and any partitioning. One doc_id exchange total. Empty
    text scores as the tokenizer's single empty token (split('') =
    [''] on every engine — the text-family convention), so every
    document appears exactly once."""
    from .textstats import hashed_token_features

    dim = len(weights)
    if dim == 0:
        raise ValueError("weights must be non-empty")
    warr = F.array(*[F.lit(int(w)).cast("long") for w in weights])
    feats = hashed_token_features(documents, dim)
    contrib = F.col("s") * F.element_at(warr, (F.col("bucket") + 1).cast("int"))
    scored = (
        feats.select("doc_id", contrib.alias("__c"))
        .groupBy("doc_id")
        .agg(
            F.sum("__c").alias("__raw"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )
    score = (F.col("__raw") + F.lit(int(bias))).cast("double") / (
        F.lit(float(scale)) * F.col("n_tokens")
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        score.alias("score"),
        (score > F.lit(float(threshold))).alias("keep"),
    )


def negative_pairs(
    documents: DataFrame,
    k: int = 4,
    id_col: str = "doc_id",
    seed: str = "neg",
) -> DataFrame:
    """Deterministic contrastive NEGATIVE sampling: for every document,
    ``k`` pseudo-random partners drawn uniformly from the corpus —
    (doc_id, neg_i, neg_id) — with no RNG state: partner choice is a
    pure function of (seed, neg_i, doc_id), so pair sets are
    reproducible across runs, partitionings, and engines, and stable
    for the anchors that existed when the corpus grows only by append
    at the id tail.

    Shape: the corpus gets dense ranks via the bucketed prefix-sum
    row-numbering (``windows.global_row_numbers`` — no single-task
    window), each anchor explodes into ``k`` md5-derived target ranks
    (mod N, one broadcast scalar), a deterministic +1 skip avoids
    self-pairs, and one rank-equality join resolves targets back to
    ids. Two narrow shuffles regardless of corpus width; requires ≥ 2
    documents (the self-skip wraps mod N).
    """
    from .windows import global_row_numbers

    idx = global_row_numbers(
        documents.select(id_col), id_col, out_col="__rank"
    )
    n = idx.agg(F.count(F.lit(1)).alias("__n"))
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(seed),
                    F.col("neg_i").cast("string"),
                    F.lit("|"),
                    F.col(id_col).cast("string"),
                ).cast("binary")
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    tgt0 = h % F.col("__n")
    own0 = F.col("__rank") - 1
    anchors = (
        idx.crossJoin(F.broadcast(n))
        .select(
            id_col,
            "__rank",
            "__n",
            F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("neg_i"),
        )
        .withColumn(
            "__tgt",
            F.when(tgt0 == own0, (tgt0 + 1) % F.col("__n")).otherwise(tgt0)
            + 1,
        )
    )
    targets = idx.select(
        F.col("__rank").alias("__tgt"), F.col(id_col).alias("neg_id")
    )
    return anchors.join(targets, "__tgt").select(
        id_col, F.col("neg_i").cast("int").alias("neg_i"), "neg_id"
    )


def shard_plan(
    documents: DataFrame,
    tokens_per_shard: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic shard assignment for balanced training-data
    output: documents in stable ``id_col`` order are packed into
    consecutive shards of ≈ ``tokens_per_shard`` whitespace tokens —
    (doc_id, n_tokens, cum_tokens, shard) with shard = ⌊(cum −
    n)/budget⌋, the greedy boundary rule (a doc starts in the shard
    its PREFIX lands in, so every shard except the last holds at
    least one token and order is preserved across shards).

    At 100 TB this is the writer-planning step before
    ``df.repartitionByRange(shard).write`` — shards become even-sized
    output files no matter how skewed document lengths are. The prefix
    sum reuses the bucketed dense-rank pattern
    (``windows.global_row_numbers``): token counts cumulate inside
    value-range buckets (one corpus exchange) with broadcast
    per-bucket offsets — no single-task window over the corpus.
    """
    from .windows import global_row_numbers
    from pyspark.sql import Window as _W

    toks = F.size(F.split(F.col(text_col), r"\s+")).cast("long")
    base = documents.select(F.col(id_col), toks.alias("n_tokens"))
    ranked = global_row_numbers(base, id_col, out_col="__rank")
    # global cumsum WITHOUT a single-task window: cumulate inside
    # dense-rank buckets, then add broadcast per-bucket offsets — the
    # same two-level shape the rank itself used
    n_buckets = 64
    total = base.agg(F.count(F.lit(1)).alias("__total"))
    # persisted: BOTH the in-bucket cumsum branch and the per-bucket
    # offset branch read this frame — without the persist the rank
    # windows upstream run twice (plan-audited)
    from ..caching import scoped_persist

    bucketed = scoped_persist(
        ranked.crossJoin(F.broadcast(total)).withColumn(
            "__b",
            ((F.col("__rank") - 1) * n_buckets / F.col("__total")).cast(
                "int"
            ),
        )
    )
    w_in = (
        _W.partitionBy("__b")
        .orderBy("__rank")
        .rowsBetween(_W.unboundedPreceding, 0)
    )
    in_bucket = bucketed.withColumn("__cum_in", F.sum("n_tokens").over(w_in))
    offsets = (
        bucketed.groupBy("__b")
        .agg(F.sum("n_tokens").alias("__bn"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__bn").over(
                    _W.orderBy("__b").rowsBetween(_W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("__b", "__off")
    )
    return (
        in_bucket.join(F.broadcast(offsets), "__b")
        .select(
            id_col,
            "n_tokens",
            (F.col("__cum_in") + F.col("__off")).alias("cum_tokens"),
            F.floor(
                (F.col("__cum_in") + F.col("__off") - F.col("n_tokens"))
                / F.lit(tokens_per_shard)
            ).cast("long").alias("shard"),
        )
    )


def dataset_card(documents: DataFrame) -> DataFrame:
    """Per-source dataset datasheet — the one-stop summary a curation
    review starts from: (source, n_docs, n_unique, dup_rate,
    total_tokens, pct_en, median_chars). ONE grouped aggregate over a
    narrow projection (content hash, token count, lang flag computed
    map-side); every statistic is either an exact integer, a
    BIGINT/BIGINT division, or an exact dyadic-position percentile —
    engine-exact without any lattice tricks.
    """
    base = documents.select(
        "source",
        F.md5(F.col("text").cast("binary")).alias("__md5"),
        F.size(F.split(F.col("text"), r"\s+")).cast("long").alias("__tok"),
        (F.col("lang") == "en").cast("long").alias("__en"),
        F.col("n_chars"),
    )
    return base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("__md5").alias("n_unique"),
        (
            (F.count(F.lit(1)) - F.countDistinct("__md5"))
            / F.count(F.lit(1))
        ).alias("dup_rate"),
        F.sum("__tok").alias("total_tokens"),
        (F.sum("__en") / F.count(F.lit(1))).alias("pct_en"),
        F.percentile("n_chars", 0.5).alias("median_chars"),
    )


def epoch_plan(
    documents: DataFrame,
    budget_tokens: int = 100_000,
    epoch_cap: float = 4.0,
) -> DataFrame:
    """Data-budget epoch planner: given a token budget for one
    training run, allocate it across sources by temperature-2 weights
    (√tokens, the same flattening as ``temperature_mix``) and report
    the implied per-source EPOCH count — (source, tokens_available,
    weight, tokens_target, epochs, over_cap). ``epochs`` > 1 means the
    source repeats; ``over_cap`` flags sources whose repetition
    exceeds ``epoch_cap`` (the data-constrained-scaling rule of thumb
    that repeated data stops helping) — exactly the report that
    decides whether a mix is feasible before any shard is written.

    Determinism: √tokens floor-quantizes onto the 2^-20 lattice and
    the cross-source normalizer folds those BIGINTs (order-free); each
    output is then a fixed double expression per source.
    """
    toks = F.size(F.split(F.col("text"), r"\s+")).cast("long")
    per_source = documents.groupBy("source").agg(
        F.sum(toks).alias("tokens_available")
    )
    lat = F.lit(float(1 << 20))
    sq = F.floor(F.sqrt(F.col("tokens_available").cast("double")) * lat).cast(
        "long"
    )
    with_sq = per_source.withColumn("__sq", sq)
    norm = with_sq.agg(F.sum("__sq").alias("__norm"))
    j = with_sq.crossJoin(F.broadcast(norm))
    weight = F.col("__sq").cast("double") / F.col("__norm").cast("double")
    target = weight * F.lit(float(budget_tokens))
    epochs = target / F.col("tokens_available").cast("double")
    return j.select(
        "source",
        "tokens_available",
        weight.alias("weight"),
        target.alias("tokens_target"),
        epochs.alias("epochs"),
        (epochs > F.lit(epoch_cap)).cast("long").alias("over_cap"),
    )


def split_leakage(
    documents: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """Train/test NEAR-DUP leakage report: after the deterministic
    ``hash_split``, exact-dup holdout is guaranteed only for identical
    ids — near-duplicate TEXT can still straddle the split and leak
    eval content into training. This query finds exactly those pairs:
    (doc_a, doc_b, split_a, split_b, jaccard) where the two sides land
    in DIFFERENT splits — the check a careful pipeline runs before
    trusting its eval numbers.

    Shape: the near-dup pair stream comes from the stop-shingle-capped
    Jaccard join (the proven Σdf² bound); split labels are pure
    hash projections joined onto the (tiny) pair list, never onto the
    corpus. An empty result is the PASS condition.
    """
    from . import dedup as _dedup

    labeled = hash_split(documents.select("doc_id"), "doc_id")
    pairs = _dedup.ngram_jaccard_pairs(documents, n=2, threshold=threshold)
    a = labeled.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
    )
    b = labeled.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
    )
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select("doc_a", "doc_b", "split_a", "split_b", "jaccard")
    )


def quota_sample(
    documents: DataFrame,
    k: int = 10,
    strata_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "quota",
) -> DataFrame:
    """EXACT-quota deterministic sampling: exactly ``k`` documents per
    stratum (fewer only if the stratum is smaller), chosen as the k
    smallest content-addressed hash buckets — the balanced eval-set
    constructor fraction sampling cannot give you (fractions wobble
    per stratum; quotas don't), still with zero RNG state: membership
    is a pure function of (seed, id) and re-runs are identical.

    One rank window per stratum (strata are the partition key, so the
    sort is per-group and balanced); the hash order stands in for a
    shuffle, and adding k+1th-smallest docs later CANNOT evict an
    existing member unless their hash is smaller — quota membership
    degrades gracefully under corpus growth.
    """
    from pyspark.sql import Window as _W

    b = hash_bucket(F.col(id_col), seed)
    w = _W.partitionBy(strata_col).orderBy(b.asc(), F.col(id_col).asc())
    return (
        documents.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(id_col, strata_col, F.col("__rk").cast("int").alias("rk"))
    )


def c4_clean_rules(
    documents: DataFrame,
    text_col: str = "text",
    min_words_per_line: int = 3,
    min_sentences: int = 5,
    keep_text: bool = False,
) -> DataFrame:
    r"""The C4 cleaning-rule battery (Raffel et al. 2020, §2.2 — the
    line/page heuristics that turned Common Crawl into C4), per
    document: retain only lines that end in a terminal punctuation
    mark (period, exclamation mark, question mark, or end quotation
    mark), contain at least ``min_words_per_line`` words, and do not
    mention the word "javascript"; then drop the whole page if the
    retained text has fewer than ``min_sentences`` sentences, contains
    the phrase "lorem ipsum", or contains a curly bracket. (The
    paper's remaining two steps are separate operators here: the
    dirty-word page filter is a stop-list scan à la
    ``boilerplate_scrub``, and the three-sentence-span corpus dedup is
    ``dedup.chunk_dedup`` / ``dedup.remove_repeated_spans``.)

    Emits per-line counts, the kept-line text's md5 (so the oracle
    pins the actual cleaned TEXT, not just the flags), one boolean per
    named rule, and the conjunction ``pass_c4``.

    Determinism + scale: ONE projection — the line array is projected
    once, every line predicate is a codegen higher-order-function
    lambda, page flags are integer comparisons and substring scans.
    No shuffle, no UDF, no Python: the plan is a map-only stage that
    scans 100 TB embarrassingly parallel. Every regex used parses
    identically in Java regex and RE2 (no lookaround, no backrefs,
    ``\z`` end-of-input anchors — never ``$``, which Java also matches
    before a trailing line terminator — and Java's ``\s`` spelled out
    as ``[ \t\n\x0B\f\r]`` because RE2's ``\s`` lacks ``\x0B``), so a
    DuckDB oracle replays each flag and the cleaned-text hash
    bit-for-bit, including on CRLF documents.
    """
    raw = F.col(text_col)

    # Terminal-punctuation check: `[.!?"][ \r]*\z` on the RAW line —
    # punctuation followed only by spaces/CRs to end-of-input. This
    # subsumes the old rtrim-then-`$` form and fixes two cross-engine
    # divergences (ADVICE r10): Java's `$` also matches before a final
    # line terminator (so 'abc.\r' from a CRLF document was kept in
    # Spark but dropped by the RE2 oracle), and rtrim strips only
    # spaces, not '\r'. `\z` is end-of-INPUT in both engines. The word
    # split spells Java's \s out as [ \t\n\x0B\f\r] because RE2's \s
    # lacks \x0B — the entropy_stats convention.
    def _line_kept(ln: Column) -> Column:
        words = F.size(
            F.filter(
                F.split(ln, r"[ \t\n\x0B\f\r]+"),
                lambda w: w != F.lit(""),
            )
        )
        return (
            ln.rlike(r'[.!?"][ \r]*\z')
            & (words >= min_words_per_line)
            & ~ln.rlike(r"(?i)javascript")
        )

    lined = documents.select(
        "doc_id",
        raw.alias("_text"),
        F.split(raw, "\n").alias("_lines"),
    ).select(
        "doc_id",
        "_text",
        F.size("_lines").cast("long").alias("n_lines"),
        F.filter("_lines", _line_kept).alias("_kept"),
    )
    # Project the joined clean text ONCE (it feeds five downstream
    # expressions; CollapseProject never inlines a non-cheap alias
    # with multiple uses, so this pins single evaluation without
    # relying on codegen subexpression elimination).
    cleaned = lined.select(
        "doc_id",
        "_text",
        "n_lines",
        F.size("_kept").cast("long").alias("n_kept_lines"),
        F.array_join("_kept", "\n").alias("_clean"),
    )
    clean = F.col("_clean")
    # C4 counts sentences in the RETAINED text; sentence ≈ one
    # terminal punctuation mark (. ! ?) — the paper's own splitter is
    # this coarse, and the integer count keeps the flag exact. Counted
    # by length deltas (the Gopher-battery idiom), not a char explode.
    n_sent = sum(
        (
            F.length(clean) - F.length(F.replace(clean, F.lit(mark)))
            for mark in (".", "!", "?")
        ),
        F.lit(0),
    ).cast("long")
    m = cleaned.select(
        "doc_id",
        "n_lines",
        "n_kept_lines",
        # keep_text=True additionally carries the cleaned text itself
        # (for composition — web_pipeline feeds it to the Gopher
        # battery); the default drops it so gate schemas stay narrow.
        *([clean.alias("clean_text")] if keep_text else []),
        F.length(clean).cast("long").alias("n_clean_chars"),
        F.md5(clean).alias("clean_md5"),
        n_sent.alias("n_sentences"),
        F.contains(F.lower("_text"), F.lit("lorem ipsum")).alias(
            "has_lorem_ipsum"
        ),
        F.contains(F.col("_text"), F.lit("{")).alias("has_curly_brace"),
    )
    return m.select(
        "*",
        (F.col("n_sentences") >= min_sentences).alias("rule_min_sentences"),
        (~F.col("has_lorem_ipsum")).alias("rule_no_lorem"),
        (~F.col("has_curly_brace")).alias("rule_no_curly"),
    ).select(
        "*",
        (
            F.col("rule_min_sentences")
            & F.col("rule_no_lorem")
            & F.col("rule_no_curly")
        ).alias("pass_c4"),
    )


def web_pipeline(
    documents: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_sentences: int = 5,
) -> DataFrame:
    """End-to-end web-corpus curation in the FineWeb / RefinedWeb
    shape (Penedo et al. 2023/2024): C4 line/page rules → Gopher
    quality battery over the C4-CLEANED text → exact dedup among full
    survivors. Per document: both stage verdicts plus ``keep`` — true
    iff the doc passes C4 and Gopher AND is the first (min doc_id)
    surviving copy of its cleaned text.

    Composition is the point: the two rule batteries fuse into ONE
    map-only projection chain — the Gopher stage CARRIES the C4 flags
    through (``carry=``) instead of re-joining on doc_id. Dedup is
    elected among SURVIVORS (min surviving doc_id per clean_md5) —
    dropping a filtered doc must never waste a duplicate slot, the
    order real pipelines apply.

    Election shape (r10 verdict item 8): the shared skew-safe
    two-level aggregate + join (``dedup.keeper_election``), never a
    ``Window.partitionBy(clean_md5)``. clean_md5 has a GUARANTEED hot
    key at corpus scale — every document whose cleaned text is empty
    (all lines failed the C4 line rules) hashes to md5(''), and such
    rows can never be keepers (zero words fails the Gopher word-count
    rule) yet a window would still funnel all of them through one
    reducer. With the aggregate+join shape the hot key collapses
    map-side in the aggregate branch and then resolves through the
    heavy-hitter HYBRID join: keys with >= heavy_threshold copies
    (md5('') guaranteed among them at scale) broadcast and join
    map-side — their rows never shuffle by clean_md5 — while light
    keys take a shuffle join whose reducer is bounded by the
    threshold (AQE's skew-join split never fires on aggregate-fed
    joins, and salting would replicate the corpus-sized firsts
    table; both measured, SCALE.md round-11(4)). The cost is a second
    evaluation of the fused battery chain for the aggregate branch —
    2x embarrassingly-parallel map work for the removal of an
    unsplittable single-reducer hot spot (measured, isolated-rep
    protocol at sf0.1: 1.93 s vs the window shape's 1.61 s frozen
    entry, ~1.2x — the map work parallelizes with executor count,
    the hot reducer does not).
    """
    from .dedup import keeper_election
    from .textstats import gopher_quality_rules

    c4 = c4_clean_rules(
        documents,
        text_col=text_col,
        min_sentences=min_sentences,
        keep_text=True,
    )
    g = gopher_quality_rules(
        c4.select("doc_id", "clean_text", "clean_md5", "n_sentences", "pass_c4"),
        min_words=min_words,
        max_words=max_words,
        text_col="clean_text",
        carry=("clean_md5", "n_sentences", "pass_c4"),
    )
    survives = F.col("pass_c4") & F.col("pass_gopher")
    # Persist the NARROW pre-election table (hash + flags, ~50 B/doc —
    # spill-backed MEMORY_AND_DISK): keeper_election evaluates its
    # input for the probe AND the aggregate branch, and without the
    # persist each branch re-runs the whole fused regex battery.
    # Measured (scripts/pipeline_fusion_study.py, x100): unpersisted
    # fused 9.4 s vs staged-to-parquet 5.5 s — the r10 fusion win had
    # INVERTED under the skew-safe election; persisting the narrow
    # table restores single battery evaluation while keeping the
    # fused plan and skipping the staged write's parquet round-trip.
    from ..caching import scoped_persist

    narrow = scoped_persist(
        g.select(
            "doc_id",
            "clean_md5",
            "n_words",
            "n_sentences",
            "pass_c4",
            "pass_gopher",
            survives.alias("__survives"),
        )
    )
    elected = keeper_election(
        narrow,
        "clean_md5",
        eligible=F.col("__survives"),
        first_col="__first",
    )
    return elected.select(
        "doc_id",
        "clean_md5",
        "n_words",
        "n_sentences",
        "pass_c4",
        "pass_gopher",
        (
            F.col("__survives") & (F.col("doc_id") == F.col("__first"))
        ).alias("keep"),
    )


def full_curation(
    documents: DataFrame,
    history_max_id: int,
    url_col: str = "url",
    min_words: int = 50,
    min_sentences: int = 5,
    domain_min_docs: int = 5,
    max_dup_rate: float = 0.5,
    para_min_chars: int = 2,
    para_sep: str = "\n\n",
    neardup_threshold: float = 0.5,
    k: int = 8,
    bands: int = 4,
    n: int = 2,
    chunk: int = 64,
    stride: int = 48,
    max_tokens: int = 256,
    n_shards: int = 8,
) -> DataFrame:
    """END-TO-END curation capstone (r11 verdict item 6) — the
    FineWeb shape as ONE composed plan, pinning the cross-operator
    contracts (column names, keeper semantics, survivor ordering)
    that individual gates can't see:

    1. ``urls.domain_rollup`` builds the suspect-domain blocklist
       from the corpus's own URLs and ``urls.domain_filter`` drops
       blocked documents (broadcast anti join — map-only);
    2. ``web_pipeline`` (C4 line/page rules → Gopher battery →
       skew-safe exact-dedup keeper election) picks the kept docs;
    3. the kept docs' C4-cleaned text (recomputed map-only on the
       kept subset — cheaper than carrying corpus-wide text through
       the election exchange) runs Dolma-style PARAGRAPH dedup
       (``dedup.line_dedup`` with a blank-line separator,
       ``keep_text=True``) and the rebuilt text flows on;
    4. documents below ``history_max_id`` form the already-curated
       HISTORY; the rest land as the incoming batch and screen
       against history with ``dedup.incremental_neardup`` — batch
       near-dups drop, history and surviving batch docs go forward;
    5. survivors chunk (``chunk_documents``) and pack
       (``pack_chunks``) into ``doc_id % n_shards`` shards.

    Returns the final packed-chunk table: (doc_id, chunk_id, shard,
    n_tokens, chunk_text, pack_offset, pack_id).

    Scale posture is inherited stage-for-stage from the component
    operators (each documented and benched on its own): the corpus
    text crosses exactly three exchanges end-to-end — the paragraph
    election's line-keyed shuffle, the doc_id-keyed paragraph
    rebuild, and the pack window's shard-keyed sort — everything
    else is map-only, broadcast-pruned, or verdict-row-sized. The
    intermediate verdict tables (web_pipeline's keep column, the
    near-dup rollup) are persisted by their own operators where
    re-evaluation would repeat regex batteries.

    Deployment: fused-vs-staged is a measured TIE (within 3% at x1
    and x10 — SCALE.md round-12(2), both variants row-identical), so
    choose by operations, not speed: this composed form for
    interactive/one-shot runs; stage each boundary to parquet
    (scripts/full_curation_staged_study.py's ``staged`` shows the
    layout) when a production scheduler needs per-stage restart."""
    from .dedup import incremental_neardup, line_dedup
    from .urls import domain_filter, domain_rollup

    block = domain_rollup(
        documents,
        url_col=url_col,
        min_docs=domain_min_docs,
        max_dup_rate=max_dup_rate,
    ).filter(F.col("is_suspect"))
    filtered = domain_filter(documents, block, url_col=url_col).select(
        "doc_id", "text"
    )
    wp = web_pipeline(
        filtered, min_words=min_words, min_sentences=min_sentences
    )
    kept = filtered.join(
        wp.filter(F.col("keep")).select("doc_id"), "doc_id", "left_semi"
    )
    # Stage-boundary lineage CUTS (localCheckpoint, the
    # textstats/ingest precedent): line_dedup references its input
    # ~4x and the near-dup + survivor stages reference the
    # paragraph-deduped table ~8x, so an uncut six-stage composition
    # multiplies the upstream subtree into the plan ~64x — measured
    # to OOM the driver just BUILDING the plan string at sf0.01, let
    # alone scheduling it. Each checkpoint materializes exactly the
    # table the next stage must consume anyway (a production run
    # would stage these to parquet between jobs); downstream plans
    # read a leaf.
    clean = (
        c4_clean_rules(kept, min_sentences=min_sentences, keep_text=True)
        .select("doc_id", F.col("clean_text").alias("text"))
        .localCheckpoint()
    )
    para = (
        line_dedup(
            clean,
            min_line_chars=para_min_chars,
            sep=para_sep,
            keep_text=True,
        )
        .select("doc_id", F.col("text_clean").alias("text"))
        .localCheckpoint()
    )
    hist = para.filter(F.col("doc_id") < history_max_id)
    batch = para.filter(F.col("doc_id") >= history_max_id)
    nd = incremental_neardup(
        hist, batch, k=k, bands=bands, n=n, threshold=neardup_threshold
    )
    survivors = hist.unionByName(
        batch.join(
            nd.filter(~F.col("is_neardup")).select("doc_id"),
            "doc_id",
            "left_semi",
        )
    )
    chunks = chunk_documents(survivors, chunk=chunk, stride=stride)
    packed = pack_chunks(
        chunks.withColumn(
            "shard", (F.col("doc_id") % n_shards).cast("long")
        ),
        max_tokens=max_tokens,
    )
    return packed.select(
        "doc_id",
        "chunk_id",
        "shard",
        "n_tokens",
        "chunk_text",
        "pack_offset",
        "pack_id",
    )


def span_corruption(
    documents: DataFrame,
    text_col: str = "text",
    mask_ratio: float = 0.15,
    span_len: int = 3,
    seed: str = "t5",
) -> DataFrame:
    """T5/UL2-style span-corruption sample prep (Raffel et al. 2020
    §3.1.4 denoising objective): mask contiguous token spans and emit
    the (inputs, targets) pair the trainer consumes — inputs with
    each masked span replaced by its ``<extra_id_k>`` sentinel,
    targets as the sentinel-delimited masked spans plus the terminal
    sentinel.

    DETERMINISTIC BLOCK VARIANT: T5 samples span starts and lengths
    from an RNG; at corpus scale that makes samples depend on
    partitioning and re-runs. Here the token stream is cut into
    fixed blocks of ``round(span_len / mask_ratio)`` tokens and each
    FULL block masks exactly one ``span_len`` span whose offset is
    the portable md5 bucket of (seed, doc, block) — so the masked
    fraction is exactly ``span_len/block`` per full block (the tail
    stays unmasked), spans can never overlap, every sample is a pure
    function of (seed, text), and a SQL oracle replays inputs and
    targets byte-for-byte. Span k's sentinel is ``<extra_id_k>`` in
    block order; targets end with ``<extra_id_{n_spans}>``, T5's
    terminal sentinel.

    Scale shape: ONE projection — tokenize once, block spans derived
    in-row (sequence + transform), inputs/targets rebuilt with
    index-lambda transforms and array_join. No shuffle, no UDF, no
    RNG; the plan is a map-only scan at any corpus size."""
    block = max(span_len + 1, int(round(span_len / mask_ratio)))
    base = documents.select(
        "doc_id", F.split(F.col(text_col), r"\s+").alias("__tk")
    )
    n = F.size("__tk")
    n_blocks = F.floor(n / F.lit(block)).cast("int")
    # offset of block b's masked span inside the block: md5 bucket of
    # (seed, doc, b) mod the legal start range (block - span_len + 1)
    off = lambda b: (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"spancorr|{seed}|"),
                        F.col("doc_id").cast("string"),
                        F.lit("|"),
                        b.cast("string"),
                    ).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % F.lit(block - span_len + 1)
    )
    # absolute 0-based span starts, one per full block
    starts = F.transform(
        F.sequence(F.lit(0), n_blocks - 1),
        lambda b: (b * F.lit(block) + off(b)).cast("int"),
    )
    withs = base.select(
        "doc_id",
        "__tk",
        n.cast("long").alias("n_tokens"),
        F.when(n_blocks > 0, starts)
        .otherwise(F.array().cast("array<int>"))
        .alias("__st"),
    )
    st = F.col("__st")
    # position i's block (candidate span index) and that span's start.
    # F.get (0-based, NULL out of bounds) — element_at RAISES on an
    # out-of-range index under Spark 4's default ANSI mode, and tail
    # positions past the last full block index past the starts array.
    blk = lambda i: F.floor(i / F.lit(block)).cast("int")
    span_start = lambda i: F.get(st, blk(i))
    in_span = lambda i: (
        (i >= span_start(i)) & (i < span_start(i) + F.lit(span_len))
    )
    sentinel = lambda k: F.concat(
        F.lit("<extra_id_"), k.cast("string"), F.lit(">")
    )
    # inputs: sentinel at each span start, masked tokens dropped,
    # everything else verbatim (NULLs vanish in the filter)
    inputs_arr = F.filter(
        F.transform(
            F.col("__tk"),
            lambda t, i: F.when(
                in_span(i) & (i == span_start(i)), sentinel(blk(i))
            ).when(in_span(i), F.lit(None).cast("string")).otherwise(t),
        ),
        lambda x: x.isNotNull(),
    )
    # targets: <extra_id_k> + span tokens per block, then the terminal
    targets_arr = F.concat(
        F.flatten(
            F.transform(
                st,
                lambda s, k: F.concat(
                    F.array(sentinel(k)),
                    F.slice(F.col("__tk"), s + 1, span_len),
                ),
            )
        ),
        F.array(sentinel(F.size(st))),
    )
    return withs.select(
        "doc_id",
        "n_tokens",
        F.size(st).cast("long").alias("n_spans"),
        (F.size(st) * F.lit(span_len)).cast("long").alias("n_masked"),
        F.concat_ws(" ", inputs_arr).alias("inputs"),
        F.concat_ws(" ", targets_arr).alias("targets"),
    )


def fim_transform(
    documents: DataFrame,
    text_col: str = "text",
    fim_rate: float = 0.5,
    min_tokens: int = 4,
    seed: str = "fim",
) -> DataFrame:
    """Fill-in-the-middle sample prep (Bavarian et al. 2022 — the
    code-model training transform): a deterministic ``fim_rate``
    fraction of documents is rewritten in PSM order —
    ``<fim_prefix> P <fim_suffix> S <fim_middle> M`` — so the model
    learns infilling while the rest pass through verbatim
    (``fim_applied`` false).

    Determinism (the span_corruption convention): document selection
    is the content-addressed ``hash_bucket`` (a doc's FIM fate never
    changes as the corpus grows), and the two token cut points are
    portable md5 buckets of (seed, doc) over [0, n] — a pure function
    of (seed, text), partitioning-independent, byte-replayable in
    SQL. Documents under ``min_tokens`` tokens pass through (a
    sub-4-token FIM sample is degenerate).

    Scale: one map-only projection — tokenize once, two bucket
    draws, three in-row slices, one join. No RNG, no shuffle, no
    UDF."""
    base = documents.select(
        "doc_id", F.split(F.col(text_col), r"\s+").alias("__tk")
    )
    n = F.size("__tk")

    def _cut(tag: str) -> Column:
        h = F.md5(
            F.concat(
                F.lit(f"fimcut|{seed}|{tag}|"),
                F.col("doc_id").cast("string"),
            ).cast("binary")
        )
        return (
            F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
            % (n + 1).cast("long")
        ).cast("int")

    c1, c2 = _cut("a"), _cut("b")
    lo, hi = F.least(c1, c2), F.greatest(c1, c2)
    applied = (
        hash_bucket(F.col("doc_id"), f"fim|{seed}")
        < F.lit(int(fim_rate * _BUCKETS))
    ) & (n >= min_tokens)
    fim_arr = F.concat(
        F.array(F.lit("<fim_prefix>")),
        F.slice("__tk", 1, lo),
        F.array(F.lit("<fim_suffix>")),
        F.slice("__tk", hi + 1, n - hi),
        F.array(F.lit("<fim_middle>")),
        F.slice("__tk", lo + 1, hi - lo),
    )
    return base.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        applied.alias("fim_applied"),
        F.when(applied, lo.cast("long")).alias("cut_start"),
        F.when(applied, hi.cast("long")).alias("cut_end"),
        F.when(applied, F.concat_ws(" ", fim_arr))
        .otherwise(F.concat_ws(" ", "__tk"))
        .alias("output"),
    )


def pack_stats(
    packed: DataFrame,
    max_tokens: int,
    shard_col: str = "shard",
) -> DataFrame:
    """Packing-efficiency audit over ``pack_chunks`` output — the
    numbers a shard-assembly pipeline checks before shipping packs to
    a trainer: per (shard, pack_id): ``n_chunks``, ``n_tokens``
    (token mass whose START offset falls in the pack), ``n_straddle``
    (chunks crossing the pack's right boundary — the concat-and-chunk
    slice points), and ``fill_ratio`` (n_tokens / max_tokens; only a
    shard's LAST pack can be under-full by construction, so a low
    fill anywhere else means the input ordering broke).

    One aggregation keyed on (shard, pack_id) — the same key space
    the packs themselves parallelize over; no window, no join. The
    fill_ratio division is the only float, computed once per output
    row."""
    straddle = (
        F.col("pack_offset") + F.col("n_tokens")
        > (F.col("pack_id") + 1) * F.lit(max_tokens)
    )
    return (
        packed.groupBy(shard_col, "pack_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.sum(straddle.cast("int")).cast("long").alias("n_straddle"),
        )
        .select(
            shard_col,
            "pack_id",
            "n_chunks",
            "n_tokens",
            "n_straddle",
            (F.col("n_tokens") / F.lit(max_tokens)).alias("fill_ratio"),
        )
    )
