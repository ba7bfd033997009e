"""Text analysis over the documents table — the language-ID, quality
scoring, token counting, and fingerprinting operators a training-data
pipeline runs before dedup/filtering (north-star surface; not in the
reference, which has no free-text processing).

Everything is native ``pyspark.sql.functions`` — split/regexp/md5 run
JVM-side inside whole-stage codegen; no Python UDFs, so the same plan
scans 100 TB of text without a serde boundary. Ratios are single
double divisions of exact integer counts, so results are
engine-portable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# marker-token tables for the n-gram/stopword language heuristic.
# Fixed, tiny: shipped as literal arrays into the plan (no join).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "und", "die", "das", "ein"],
    "fr": ["le", "et", "les", "des", "une"],
    "es": ["el", "y", "los", "las", "una"],
}

_PUNCT_RE = r"[^a-zA-Z0-9\s]"


def _tokens(col: str = "text") -> Column:
    return F.split(F.col(col), r"\s+")


def token_stats(documents: DataFrame) -> DataFrame:
    """Token counting: whitespace tokens plus a BPE-ish subword count
    (4 chars ≈ 1 subword, ceil) — the standard cheap token estimate."""
    toks = _tokens()
    return documents.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_measured"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique_tokens"),
        F.ceil(F.length("text") / 4).cast("long").alias("n_subwords_est"),
    )


def _marker_hits(toks: Column, markers: list[str]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def quality_and_language(documents: DataFrame) -> DataFrame:
    """Quality ratios + stopword-marker language ID.

    lang_guess picks the language whose marker tokens hit most often,
    with a fixed comparison order (en > de > fr > es) so ties resolve
    identically on any engine.
    """
    toks = _tokens()
    n_tok = F.size(toks)
    punct = F.length(F.regexp_replace("text", r"[a-zA-Z0-9\s]", ""))
    hits = {lang: _marker_hits(toks, m) for lang, m in LANG_MARKERS.items()}
    best = hits["en"]
    for lang in ("de", "fr", "es"):
        best = F.greatest(best, hits[lang])
    lang_guess = (
        F.when(hits["en"] == best, "en")
        .when(hits["de"] == best, "de")
        .when(hits["fr"] == best, "fr")
        .otherwise("es")
    )
    stop_ratio = (hits["en"].cast("double") / n_tok).alias("stopword_ratio")
    return documents.select(
        "doc_id",
        "lang",
        F.col("n_chars"),
        n_tok.cast("long").alias("n_tokens"),
        (punct.cast("double") / F.length("text")).alias("punct_ratio"),
        stop_ratio,
        (F.size(F.array_distinct(toks)).cast("double") / n_tok).alias("distinct_ratio"),
        lang_guess.alias("lang_guess"),
        *[hits[lang].cast("long").alias(f"hits_{lang}") for lang in LANG_MARKERS],
    )


def fingerprints(documents: DataFrame) -> DataFrame:
    """Document fingerprinting: an exact content hash (md5 of the raw
    text) and an order-insensitive bag-of-words fingerprint (md5 of the
    sorted distinct token list) — the cheap pre-filter for exact and
    shuffled-text dedup."""
    toks = _tokens()
    return documents.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("content_md5"),
        F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(toks))).cast("binary")
        ).alias("bag_md5"),
    )


def repetition_stats(documents: DataFrame) -> DataFrame:
    """Gopher-style repetition signals per document (the filters a
    pretraining pipeline runs after quality scoring): longest run of a
    repeated token, and the fraction of all bigrams taken by the single
    most frequent bigram. High values mark boilerplate/spam.

    Plan: one posexplode of the token array; run boundaries via lag +
    running sum (the sessionize trick applied to tokens); bigram
    dominance via a NON-distinct bigram explode and a grouped max.
    Everything hash-partitions on doc_id — embarrassingly parallel
    across documents at 100 TB, bounded state per doc."""
    from pyspark.sql import Window

    toks = _tokens()
    base = documents.select("doc_id", toks.alias("t"))

    pos = base.select("doc_id", F.posexplode("t").alias("pos", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = pos.select(
        "doc_id",
        "pos",
        F.when(
            F.lag("tok").over(w).isNull() | (F.lag("tok").over(w) != F.col("tok")),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    run_ids = runs.select(
        "doc_id",
        F.sum("brk")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("run_id"),
    )
    max_run = (
        run_ids.groupBy("doc_id", "run_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("doc_id")
        .agg(F.max("n").alias("max_token_run"))
    )

    m = F.greatest(F.size("t") - 1, F.lit(0))
    bigrams = base.select(
        "doc_id",
        F.size("t").alias("n_tokens"),
        F.explode(
            F.slice(
                F.zip_with(
                    "t",
                    F.slice("t", 2, m),
                    lambda x, y: F.concat_ws(" ", x, y),
                ),
                1,
                m,
            )
        ).alias("bg"),
    )
    top_bg = (
        bigrams.groupBy("doc_id", F.col("n_tokens"), "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id", "n_tokens")
        .agg(F.max("c").alias("top_bigram_n"))
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "top_bigram_n",
            (F.col("top_bigram_n") / (F.col("n_tokens") - 1)).alias("top_bigram_frac"),
        )
    )
    return top_bg.join(max_run, "doc_id")


def tfidf_top_terms(documents: DataFrame, k: int = 3) -> DataFrame:
    """Top-``k`` characteristic terms per document by tf·idf with a
    RATIONAL idf (``N / df``, no logarithm): rankings stay engine-exact
    (a single correctly-rounded division) where ``ln`` differs in the
    last ulp across libm implementations and flips near-ties. Ties
    break on the term text, so output is fully deterministic.

    Plan: non-distinct token explode → per-(doc, term) counts; df is a
    per-term aggregate joined back (term dictionary is vocabulary-
    sized, shuffles on the term key); final per-doc top-k is one window
    over k + ties rows. No driver data path except the corpus count."""
    from pyspark.sql import Window

    n_docs = documents.count()  # one scalar to the driver
    tf = (
        documents.select("doc_id", F.explode(_tokens()).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df_, "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        ((F.col("tf") * F.lit(float(n_docs))) / F.col("df")).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("doc_id", "term", "tf", "df", "tfidf", F.col("rk").cast("long").alias("rk"))
    )


def bigram_counts(documents: DataFrame, topn: int = 100) -> DataFrame:
    """Corpus bigram frequency table (top-N): the n-gram statistic
    behind contamination probes, boilerplate detection, and LM
    vocabulary studies. Adjacent-token pairs come from one array
    transform (no self-join, no posexplode join-back); the count is a
    map-side-combinable hash aggregate and the top-N terminates in
    TakeOrderedAndProject — at 100 TB the shuffle carries only
    (bigram, partial_count) rows."""
    # tokenize in a projection FIRST — split() referenced inside the
    # lambda re-tokenizes per position (no CSE through higher-order
    # lambdas; see dedup.shingles for the measurement).
    base = documents.select(_tokens().alias("__tk"))
    toks = F.col("__tk")
    bigrams = F.when(
        F.size(toks) > 1,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        base.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram"))
        .limit(topn)
    )


def oov_rate(documents: DataFrame, vocab_k: int = 256) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus's own
    top-``vocab_k`` token vocabulary — the cheap CCNet-style "is this
    document made of normal words" quality signal (a doc whose tokens
    mostly fall outside the corpus head is gibberish, boilerplate, or
    the wrong language).

    Scale shape — the corpus is NEVER shuffled on doc_id:
      * one token-keyed hash aggregate computes corpus term frequency
        (map-side combinable; the shuffle carries (token, count) rows);
      * the vocabulary is hard-bounded at ``vocab_k`` rows via
        TakeOrderedAndProject (count desc, token asc tiebreak — fully
        deterministic), collected into ONE array row and broadcast —
        the same bounded-side inversion as boilerplate_scrub;
      * the per-doc OOV count is then a pure array-filter projection
        against the broadcast vocabulary: no explode-and-regroup, no
        UDF, whole-stage codegen end to end.

    The rate is one IEEE division of two exact integer counts —
    engine-portable bit-for-bit.
    """
    toks = F.filter(_tokens(), lambda t: t != F.lit(""))
    per_doc = documents.select("doc_id", toks.alias("__toks"))
    vocab_row = (
        per_doc.select(F.explode("__toks").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(vocab_k)
        .agg(F.collect_list("token").alias("__vocab"))
    )
    oov = F.filter(
        F.col("__toks"), lambda t: ~F.array_contains(F.col("__vocab"), t)
    )
    return per_doc.crossJoin(F.broadcast(vocab_row)).select(
        "doc_id",
        F.size("__toks").cast("long").alias("n_tokens"),
        F.size(oov).cast("long").alias("n_oov"),
        # an empty document has no OOV evidence → rate 0 (and ANSI mode
        # would otherwise raise on the 0/0 — found by hypothesis)
        F.when(F.size("__toks") == 0, F.lit(0.0))
        .otherwise(F.size(oov) / F.size("__toks"))
        .alias("oov_rate"),
    )


def token_diversity(documents: DataFrame) -> DataFrame:
    """Lexical-diversity quality signals per document, log-free:
    type-token ratio and the Simpson concentration index Σ(c_f/n)² —
    the entropy-family repetition probe that needs no logarithm
    (Shannon entropy's ln drifts a ulp across libm implementations;
    Simpson's index is a rational with an exact BIGINT numerator, so
    the scores are engine- and partitioning-exact). Low TTR or high
    Simpson flags template/spam documents the way a Gopher-style
    repetition filter does, but over the whole distribution instead of
    the single worst n-gram.

    Plan: token explode → per-(doc, term) counts → per-doc fold of
    (Σc², Σc, #terms); both aggregates are map-side combinable, the
    shuffle carries only (doc, term, count) rows, and no
    vocabulary-global state exists at all — embarrassingly parallel
    at 100 TB."""
    per_term = (
        documents.select("doc_id", F.explode(_tokens()).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        per_term.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(F.col("c") * F.col("c")).alias("simpson_num"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct",
            "simpson_num",
            (F.col("n_distinct").cast("double") / F.col("n_tokens")).alias("ttr"),
            (
                F.col("simpson_num").cast("double")
                / (F.col("n_tokens") * F.col("n_tokens")).cast("double")
            ).alias("simpson"),
        )
    )


def bpe_pair_counts(documents: DataFrame, topn: int | None = None) -> DataFrame:
    """First BPE-trainer iteration (Sennrich et al. 2016, the
    subword-vocabulary step every tokenizer build runs): corpus-wide
    counts of adjacent character pairs, weighted by word frequency.

    Plan — the classic trainer trick, which is also the 100 TB
    answer: the corpus collapses to the (word, freq) VOCABULARY first
    (one map-side-combinable aggregate; the only corpus-sized
    shuffle), so the char-level pair explode runs over vocab-sized
    data however large the corpus. Pair extraction is one in-row
    ``transform(sequence(...), substring)`` projection — codegen, no
    Python. ``topn`` returns the global head via
    TakeOrderedAndProject (total order: count desc, pair asc)."""
    words = (
        documents.select(F.explode(_tokens()).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = (
        # length-1 words carry no pair; the filter also keeps
        # sequence(1, 0) (which Spark evaluates DESCENDING) unreachable
        words.filter(F.char_length("word") >= 2)
        .select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, char_length(word) - 1), "
                    "i -> substring(word, i, 2))"
                )
            ).alias("pair"),
        )
        .groupBy("pair")
        .agg(F.sum("freq").alias("pair_count"))
    )
    if topn is not None:
        return pairs.orderBy(F.col("pair_count").desc(), "pair").limit(topn)
    return pairs


def _safe_merge_batch(
    rows: list, cap: int, remaining: int
) -> list[tuple[str, str, int]]:
    """From pair counts sorted (count desc, l asc, r asc), pick the
    longest CONTIGUOUS prefix that one driver round can merge while
    staying bit-identical to one-merge-at-a-time greedy BPE.

    A prefix pair is admissible while it is independent of every pair
    already in the batch: none of its symbols, and not its merged
    token, may equal a batch pair's symbol or merged token. The walk
    STOPS at the first inadmissible pair (contiguity is what the
    equivalence proof needs), then trims trailing pairs whose count
    ties the first excluded pair.

    Why this reproduces greedy exactly: merging batch pair p_i cannot
    change the count of batch pair p_j (their symbols are disjoint and
    p_i's merged token is not a p_j symbol), and every pair it CAN
    touch — old pairs sharing a symbol with p_i, or new pairs built
    from p_i's merged token, whose count is bounded by some old
    sharing pair's count — sits at or below the stop pair's count,
    which after the trim is STRICTLY below every batch count. So at
    each sequential greedy step the next batch pair is still the
    unique (count, l, r)-argmax. batch[0] alone is always safe: it is
    plain greedy's own argmax, ties and all.

    SELF-PAIRS raise the trim bar instead of closing the batch
    (the r8-advice refinement of the r7 fix). Merging (a, a) mints
    the CHAINED pairs (aa, a) / (aa, aa) whose counts are bounded by
    floor(count(a, a) / 2) — leftmost-first on a run of k a's with
    word weight f contributes (k-1)f to (a, a) but at most
    floor(k/2)f − ... ≤ floor((k-1)f/2) to any chained pair, with
    equality reachable ('aaa': (aa, a) = count/2 exactly) — a bound
    set by the batch pair ITSELF, not by the stop pair, so a chained
    pair can outrank a later batch member (counterexample pinned in
    tests: vocab {'aaa': 100, 'bc': 90} — greedy merges (a,a) then
    (aa,a), never (b,c)). The final trim therefore keeps only
    members STRICTLY above max(stop count, floor(c_self/2) over
    admitted self-pairs); since counts are descending, the members
    at or below that bar form a suffix, so the tail-pop removes
    exactly them. (x, aa) / (aa, y) pairs minted at run boundaries
    stay covered by the stop-pair argument: they are bounded by an
    old pair sharing 'a', and the first such sharing pair in sort
    order IS the stop.)"""
    batch: list[tuple[str, str, int]] = []
    taken: set[str] = set()  # batch symbols ∪ batch merged tokens
    stop_count = 0
    chain_bound = 0  # max floor(c/2) over admitted self-pairs
    for i, row in enumerate(rows):
        left, right, count = row["p"]["l"], row["p"]["r"], row["c"]
        if i >= cap or (
            batch and (left in taken or right in taken or (left + right) in taken)
        ):
            stop_count = count
            break
        batch.append((left, right, count))
        taken.update((left, right, left + right))
        if left == right:
            chain_bound = max(chain_bound, count // 2)
    bound = max(stop_count, chain_bound)
    while len(batch) > 1 and batch[-1][2] <= bound:
        batch.pop()
    return batch[:remaining]


def _driver_bpe(
    vocab: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Exact sequential greedy BPE over a collected (word, freq)
    vocabulary, with incremental pair-count maintenance (only words
    containing the merged pair are revisited per step). Semantics are
    bit-identical to the one-merge-at-a-time reference: leftmost-first
    non-overlapping application, ties broken (count desc, pair asc) —
    pinned against the independent test reference and the iterative
    Spark path in tests/test_curation_ops.py."""
    from collections import Counter, defaultdict

    words: list[tuple[list[str], int]] = [(list(w), f) for w, f in vocab]
    counts: Counter = Counter()
    index: defaultdict = defaultdict(set)  # pair -> word indices
    for wi, (syms, f) in enumerate(words):
        for p in zip(syms, syms[1:]):
            counts[p] += f
            index[p].add(wi)
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and counts:
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        left, right = best
        merged = left + right
        for wi in list(index.get(best, ())):
            syms, f = words[wi]
            old = Counter(zip(syms, syms[1:]))
            res: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new = Counter(zip(res, res[1:]))
            words[wi] = (res, f)
            for p in old.keys() | new.keys():
                delta = (new[p] - old[p]) * f
                if delta:
                    counts[p] += delta
                    if counts[p] <= 0:
                        del counts[p]
                if new[p]:
                    index[p].add(wi)
                else:
                    index[p].discard(wi)
    return merges


def train_bpe(
    documents: DataFrame,
    n_merges: int = 10,
    batch_cap: int = 32,
    stats: dict | None = None,
    driver_vocab_max: int = 200_000,
) -> list[tuple[str, str]]:
    """Greedy BPE merge-table training: repeatedly (count adjacent
    symbol pairs over the vocabulary) → (merge the argmax pair
    leftmost-first in every word), for ``n_merges`` merges total.
    Returns the ordered merge list — the artifact a tokenizer ships.
    Bit-identical to the one-merge-per-job trainer (pinned to an
    independent Python reference in tests), but each driver round
    harvests a BATCH of provably-independent merges
    (``_safe_merge_batch``), so a 32k-merge production vocabulary
    costs ~n_merges/batch rounds instead of n_merges sequential jobs
    wherever the corpus offers disjoint merges (natural corpora do;
    a pure single-chain corpus like 'aaaa…' degrades gracefully to
    one merge per round).

    Distributed shape: word symbol sequences live as vocab-sized
    ``array<string>`` rows; each round is ONE aggregate with a
    bounded ``limit(batch_cap + 1)`` driver fetch and ONE in-row
    ``aggregate()`` fold applying every batch merge (greedy
    leftmost-first: the fold merges the accumulator tail exactly when
    (tail, x) equals a batch pair, so 'aaa' + (a,a) → [aa, a], the
    reference semantics; batch independence guarantees (tail, x)
    matches at most one pair and never a token another batch merge
    creates). ``localCheckpoint`` per round keeps the iterative
    lineage constant-size (the PageRank lesson, graph.py:25).
    ``stats['rounds']``, if a dict is passed, records the number of
    driver rounds actually used; ``stats['path']`` records which
    execution path ran.

    DRIVER-VOCAB FAST PATH (the production tokenizer-trainer
    architecture — distributed count, vocab-sized merge loop): when
    the DISTINCT-WORD count fits ``driver_vocab_max`` (probed with a
    bounded ``limit(max+1).count()``, never an unbounded collect),
    the (word, freq) vocabulary — corpus-size-independent — is
    collected once and the merge loop runs driver-side with
    incremental pair counts, bit-identical to the iterative path.
    One Spark job total instead of one per batch round; the r9
    English-corpus study (SCALE.md round-9) measured the iterative
    path's batches collapsing to ~1.1 merges/round on natural text
    (top bigrams share letters: 'th'/'he'/'er'...), so for a
    32k-merge vocabulary this is the ~batch_cap× to ~1000× path
    whenever the vocab fits — which it does far beyond 100 TB of
    corpus (web-scale corpora hold ~10-100M distinct words; raise
    the cap to taste). ``driver_vocab_max=0`` forces the iterative
    batched path."""
    # checkpoint the vocab BEFORE the size probe: the probe and the
    # subsequent collect (or the iterative path's syms projection)
    # would otherwise each re-run the corpus-sized tokenize+shuffle
    words_vocab = (
        documents.select(F.explode(_tokens()).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .localCheckpoint()
    )
    if driver_vocab_max:
        probe = words_vocab.limit(driver_vocab_max + 1).count()
        if probe <= driver_vocab_max:
            vocab = [(r["word"], r["freq"]) for r in words_vocab.collect()]
            merges = _driver_bpe(vocab, n_merges)
            if stats is not None:
                stats["rounds"] = 1
                stats["path"] = "driver"
            return merges
    if stats is not None:
        stats["path"] = "iterative"
    words = (
        words_vocab
        .select(
            F.expr(
                "transform(sequence(1, char_length(word)), "
                "i -> substring(word, i, 1))"
            ).alias("syms"),
            "freq",
        )
        .localCheckpoint()
    )
    merges: list[tuple[str, str]] = []
    rounds = 0
    while len(merges) < n_merges:
        top = (
            words.filter(F.size("syms") >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> struct(element_at(syms, i) AS l, "
                        "element_at(syms, i + 1) AS r))"
                    )
                ).alias("p"),
            )
            .groupBy("p")
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.col("c").desc(), F.col("p.l"), F.col("p.r"))
            .limit(batch_cap + 1)
            .collect()
        )
        rounds += 1
        batch = _safe_merge_batch(top, batch_cap, n_merges - len(merges))
        if not batch:
            break
        merges.extend((left, right) for left, right, _ in batch)
        whens = " ".join(
            f"WHEN size(acc) > 0 AND element_at(acc, -1) = {_sql_str(left)} "
            f"AND x = {_sql_str(right)} "
            f"THEN concat(slice(acc, 1, size(acc) - 1), "
            f"array({_sql_str(left + right)}))"
            for left, right, _ in batch
        )
        words = words.select(
            F.expr(
                "aggregate(syms, CAST(array() AS array<string>), (acc, x) -> "
                f"CASE {whens} ELSE concat(acc, array(x)) END)"
            ).alias("syms"),
            "freq",
        ).localCheckpoint()
    if stats is not None:
        stats["rounds"] = rounds
    return merges


def bpe_encode(
    documents: DataFrame,
    merges: list[tuple[str, str]],
    by: str | None = None,
) -> DataFrame:
    """Encode the corpus vocabulary with a trained BPE merge table
    (the tokenize-for-training step that follows ``train_bpe``):
    one row per distinct word (optionally per ``by`` stratum) with its
    frequency and subword sequence.

    Semantics: merges apply one pass each, in rank order, greedy
    leftmost-first within a word — the same in-row ``aggregate()``
    fold the trainer uses, so encode(train corpus) reproduces the
    trainer's final state. On a rank-ordered table (every merged
    token's components were created by strictly earlier ranks — what
    ``train_bpe`` emits) this equals the priority-queue BPE encoder.

    Scale: the corpus collapses to the (word, freq) vocabulary FIRST
    (one shuffle), so the chained folds run once per DISTINCT word —
    vocabulary-sized compute at any corpus scale; the merge table
    compiles into a single nested codegen expression (size linear in
    ranks), no UDF, no driver loop, nothing corpus-sized anywhere."""
    keys = [by] if by else []
    words = (
        documents.select(*keys, F.explode(_tokens()).alias("word"))
        .filter(F.col("word") != "")
        .groupBy(*keys, "word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    expr = (
        "transform(sequence(1, char_length(word)), i -> substring(word, i, 1))"
    )
    for left, right in merges:
        merged = left + right
        expr = (
            f"aggregate({expr}, CAST(array() AS array<string>), (acc, x) -> "
            f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = {_sql_str(left)} "
            f"AND x = {_sql_str(right)} "
            f"THEN concat(slice(acc, 1, size(acc) - 1), array({_sql_str(merged)})) "
            "ELSE concat(acc, array(x)) END)"
        )
    return words.select(
        *keys, "word", "freq", F.expr(expr).alias("subwords")
    )


def _sql_str(s: str) -> str:
    """Single-quoted Spark SQL string literal: backslashes doubled
    FIRST (Spark parses backslash escapes inside string literals by
    default — a trailing '\\' would swallow the closing quote and a
    '\\n' would silently become a newline, desynchronizing the merge
    fold from the driver path on code/path-like corpora), then
    quotes doubled."""
    return "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"


def feature_hashing(documents: DataFrame, dim: int = 64) -> DataFrame:
    """Hashing-trick vectorizer (Weinberger et al. 2009): each token
    hashes to one of ``dim`` buckets and contributes ±1 (sign from an
    independent hash bit, so collision noise is zero-mean instead of
    additive). Emitted in sparse long form (doc_id, bucket,
    feature_val); zero-sum collisions stay as explicit 0 rows — that
    cancellation IS the trick's semantics, not a bug to filter.

    Portability: bucket = first 8 md5 hex chars as an integer mod dim,
    sign = parity of the 9th — the repo's engine-portable hash family
    (no xxhash64: DuckDB's hash() is a different function). Plan: one
    explode + one map-side-combinable sum keyed (doc, bucket) — the
    shuffle carries ≤ dim rows per document at any corpus size."""
    return (
        hashed_token_features(documents, dim)
        .groupBy("doc_id", "bucket")
        .agg(F.sum("s").alias("feature_val"))
    )


def hashed_token_features(documents: DataFrame, dim: int) -> DataFrame:
    """Token-level hashing-trick projection shared by the vectorizer
    and the linear scorer: one row per token with its ``bucket`` in
    [0, dim) and ±1 ``s`` sign (md5-derived — the engine-portable hash
    family). Pure map-side explode+projection; callers choose the one
    aggregation that suits them."""
    toks = documents.select("doc_id", F.explode(_tokens()).alias("tok"))
    h = F.md5(F.col("tok").cast("binary"))
    bucket = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % dim
    sign = (
        F.when(F.ascii(F.substring(h, 9, 1)) % 2 == 0, F.lit(1))
        .otherwise(F.lit(-1))
        .cast("long")
    )
    return toks.select("doc_id", bucket.alias("bucket"), sign.alias("s"))


def source_tvd(
    documents: DataFrame, source_a: str, source_b: str
) -> DataFrame:
    """Total-variation distance between two sources' unigram
    distributions — the log-free corpus-mix drift metric (TVD = ½Σ|p −
    q| bounds every downstream probability difference; the Jensen-
    Shannon cousin needs logs, TVD stays rational): one row (n_a, n_b,
    tvd_num, tvd) with the numerator an exact BIGINT.

    Shape: one token pass filtered to the two sources (map-side
    combinable counts per (source, token) folded in a single groupBy),
    then the cross-multiplied sum tvd_num = Σ|c_a·n_b − c_b·n_a| over
    the vocabulary (Heaps-bounded) — exact BIGINTs throughout;
    tvd = tvd_num / (2·n_a·n_b) is the one double division at the end.
    """
    toks = (
        documents.filter(F.col("source").isin(source_a, source_b))
        .select(
            "source",
            F.explode(F.split(F.col("text"), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    counts = (
        toks.groupBy("tok")
        .agg(
            F.sum((F.col("source") == source_a).cast("long")).alias("c_a"),
            F.sum((F.col("source") == source_b).cast("long")).alias("c_b"),
        )
    )
    totals = counts.agg(
        F.sum("c_a").alias("n_a"), F.sum("c_b").alias("n_b")
    )
    merged = counts.crossJoin(F.broadcast(totals))
    num = merged.select(
        "n_a",
        "n_b",
        F.abs(
            F.col("c_a") * F.col("n_b") - F.col("c_b") * F.col("n_a")
        ).alias("__d"),
    )
    return num.groupBy("n_a", "n_b").agg(
        F.sum("__d").alias("tvd_num")
    ).select(
        "n_a",
        "n_b",
        "tvd_num",
        (
            F.col("tvd_num").cast("double")
            / (F.lit(2) * F.col("n_a") * F.col("n_b")).cast("double")
        ).alias("tvd"),
    )


def langid_ngram(
    documents: DataFrame, profile_size: int = 50
) -> DataFrame:
    """Character-trigram language identification — the classic n-gram
    heuristic (Cavnar & Trenkle): build a top-``profile_size`` trigram
    PROFILE per labeled language from the corpus itself, score every
    document by how many profile trigrams it contains, predict the
    argmax language — (doc_id, lang, pred_lang, correct).

    Shapes: the trigram stream explodes in-row (no self-join); profiles
    are language-cardinality × ``profile_size`` rows (broadcast);
    scoring is one semi-style inner join on the trigram + a per-doc
    argmax window over ≤ |languages| rows. Integer counts end to end;
    ties break lexicographically (rank: count desc, trigram asc —
    prediction: score desc, lang asc) so the argmax is deterministic.
    """
    from pyspark.sql import Window as _W

    tri = documents.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(length(text) - 2, 0)), "
                "i -> substring(text, i, 3))"
            )
        ).alias("tg"),
    ).filter(F.length("tg") == 3)
    prof_counts = tri.groupBy("lang", "tg").agg(
        F.count(F.lit(1)).alias("c")
    )
    w_p = _W.partitionBy("lang").orderBy(F.desc("c"), "tg")
    profile = (
        prof_counts.withColumn("rk", F.row_number().over(w_p))
        .filter(F.col("rk") <= profile_size)
        .select(F.col("lang").alias("p_lang"), "tg")
    )
    doc_tris = tri.select("doc_id", "tg").distinct()
    scores = (
        doc_tris.join(F.broadcast(profile), "tg")
        .groupBy("doc_id", "p_lang")
        .agg(F.count(F.lit(1)).alias("score"))
    )
    w_d = _W.partitionBy("doc_id").orderBy(F.desc("score"), "p_lang")
    pred = (
        scores.withColumn("rk", F.row_number().over(w_d))
        .filter(F.col("rk") == 1)
        .select("doc_id", F.col("p_lang").alias("pred_lang"))
    )
    return (
        documents.select("doc_id", "lang")
        .join(pred, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("pred_lang", F.lit("unk")).alias("pred_lang"),
            (F.col("lang") == F.coalesce("pred_lang", F.lit("unk")))
            .cast("long")
            .alias("correct"),
        )
    )


def vocab_growth(documents: DataFrame) -> DataFrame:
    """Vocabulary growth curve (Heaps' law, empirically): distinct
    token count after scanning 25 / 50 / 75 / 100% of the corpus in
    stable doc_id order — (pct, docs_scanned, vocab_size). The curve's
    flattening rate is what justifies every vocabulary-sized-frame
    argument in this repo (stop lists, BPE vocab, profiles), so this
    op MEASURES the assumption instead of citing it.

    One pass: each token reduces to its FIRST-occurrence document rank
    (a min aggregate — no repeated prefix scans), and each checkpoint
    counts tokens whose first rank clears its threshold; ranks come
    from the bucketed dense numbering (no single-task window).
    """
    from .windows import global_row_numbers

    ranked = global_row_numbers(
        documents.select("doc_id", "text"), "doc_id", out_col="__rank"
    )
    toks = ranked.select(
        "__rank", F.explode(F.split(F.col("text"), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    first = toks.groupBy("tok").agg(F.min("__rank").alias("__fr"))
    n = ranked.agg(F.count(F.lit(1)).alias("__n"))
    cps = F.explode(F.array(*[F.lit(p) for p in (25, 50, 75, 100)])).alias(
        "pct"
    )
    grid = first.crossJoin(F.broadcast(n)).select("__fr", "__n", cps)
    thr = (F.col("__n") * F.col("pct") / 100).cast("long")
    return (
        grid.withColumn("__thr", thr)
        .groupBy("pct", "__thr")
        .agg(
            F.sum((F.col("__fr") <= F.col("__thr")).cast("long")).alias(
                "vocab_size"
            )
        )
        .select(
            F.col("pct").cast("int").alias("pct"),
            F.col("__thr").alias("docs_scanned"),
            "vocab_size",
        )
    )


def token_burstiness(documents: DataFrame, topn: int = 25, min_df: int = 5) -> DataFrame:
    """Token burstiness (Fano factor): variance-to-mean ratio of each
    token's per-document count over the WHOLE corpus (absent docs
    count 0) — content words are bursty (VMR ≫ 1: absent mostly, then
    repeated), function words are not; extreme VMR flags boilerplate
    and spam templates, which is why curation pipelines profile it.

    Exact: with N docs and per-doc counts c, VMR = (N·Σc² − (Σc)²) /
    (N·Σc) — all BIGINT cross-multiplication (zeros contribute nothing
    to Σc or Σc², so the absent-doc zeros are FREE: one token pass,
    one vocabulary-sized aggregate, the corpus count as a broadcast
    scalar). Top-``topn`` by VMR, df ≥ ``min_df``, token tiebreak.
    """
    from pyspark.sql import Window as _W

    tf = (
        documents.select(
            "doc_id", F.explode(F.split(F.col("text"), r"\s+")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_tok = tf.groupBy("tok").agg(
        F.sum("c").alias("sc"),
        F.sum(F.col("c") * F.col("c")).alias("sc2"),
        F.count(F.lit(1)).alias("df"),
    )
    n = documents.agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        per_tok.filter(F.col("df") >= min_df)
        .crossJoin(F.broadcast(n))
        .select(
            "tok",
            "sc",
            "df",
            (
                (F.col("__n") * F.col("sc2") - F.col("sc") * F.col("sc"))
                .cast("double")
                / (F.col("__n") * F.col("sc")).cast("double")
            ).alias("vmr"),
        )
    )
    w = _W.orderBy(F.desc("vmr"), "tok")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= topn)
        .select("tok", "sc", "df", "vmr", F.col("rk").cast("int").alias("rk"))
    )


def hapax_spectrum(documents: DataFrame) -> DataFrame:
    """Per-source vocabulary frequency spectrum: token count, vocab
    size, hapax / dis legomena counts (words seen exactly once /
    twice in that source's subcorpus) and the hapax share — the
    Zipf-tail health check a curation pass reads per source (a high
    hapax share flags noisy or OCR-damaged feeds; a collapsed one
    flags templated/boilerplate text). Complements ``vocab_growth``
    (which tracks NEW types over time) with the steady-state shape.

    Scale: one token explode → (source, token) count → source rollup.
    Both shuffles are map-side combinable and the second is bounded by
    per-source vocabulary, not corpus size; nothing driver-side. All
    counts are exact integers; the single share division runs on
    identical ints in both engines."""
    tok = documents.select(
        "source", F.explode(_tokens()).alias("tok")
    ).filter(F.col("tok") != "")
    counts = tok.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    one = F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
    two = F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
    return (
        counts.groupBy("source")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("vocab_size"),
            one.alias("n_hapax"),
            two.alias("n_dis"),
        )
        .withColumn(
            "hapax_share",
            F.col("n_hapax").cast("double") / F.col("vocab_size"),
        )
    )


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer (Kudo 2018, SentencePiece's second trainer family)
# ---------------------------------------------------------------------------


def word_vocab(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """The (word, freq) corpus vocabulary — the ONE corpus-sized
    aggregate every tokenizer step (BPE, unigram train, segment)
    starts from. Callers chaining train → segment should compute it
    once, localCheckpoint it, and pass it to both via ``words_df``
    so the corpus is scanned exactly once."""
    return (
        documents.select(F.explode(_tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _unigram_viterbi(word: str, counts: dict, total: int, max_len: int):
    """Deterministic integer-exact Viterbi segmentation of one word
    under a unigram LM with piece probabilities c_p / total.

    The DP maximizes prod(c_p) / total^k without ever leaving integer
    arithmetic: candidate A beats B iff prodA * total^kB >
    prodB * total^kA (bigint cross-multiplication — no float, no
    log, no tie drift). Exact ties break to fewer pieces, then to
    the lexicographically smaller piece sequence, so two independent
    implementations of THIS spec agree bit-for-bit (pinned in
    tests/test_curation_ops.py against a pure-Python reference).
    Single-character pieces are always in the vocabulary, so every
    word is segmentable; a zero-count piece contributes a legal
    zero product."""
    L = len(word)
    # best[i] = (prod, k, pieces tuple) for word[:i]
    best = [None] * (L + 1)
    best[0] = (1, 0, ())
    for i in range(1, L + 1):
        cand = None
        for j in range(max(0, i - max_len), i):
            if best[j] is None:
                continue
            piece = word[j:i]
            c = counts.get(piece)
            if c is None:
                continue
            pj, kj, seq = best[j]
            cur = (pj * c, kj + 1, seq + (piece,))
            if cand is None:
                cand = cur
            else:
                # cur > cand iff cur.prod * total^cand.k > cand.prod * total^cur.k
                lhs = cur[0] * (total ** cand[1])
                rhs = cand[0] * (total ** cur[1])
                if lhs > rhs or (
                    lhs == rhs
                    and (cur[1], cur[2]) < (cand[1], cand[2])
                ):
                    cand = cur
        best[i] = cand
    return best[L][2]


def _unigram_seed(words: DataFrame, n_seed: int, max_len: int) -> DataFrame:
    """Seed piece candidates: every substring of length 1..max_len of
    every vocabulary word, weighted by word frequency and occurrence
    count, top ``n_seed`` by (count desc, piece asc) UNION all single
    characters (which must survive every prune so any word stays
    segmentable). One in-row transform + one vocab-sized aggregate —
    corpus-size-independent, all JVM."""
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.char_length("word")),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(
                        F.lit(max_len), F.char_length("word") - i + F.lit(1)
                    ),
                ),
                lambda l: F.substring(F.col("word"), i, l),
            ),
        )
    )
    counted = (
        words.select("freq", F.explode(subs).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").alias("c"))
    )
    head = counted.orderBy(F.col("c").desc(), "piece").limit(n_seed)
    chars = counted.filter(F.char_length("piece") == 1)
    return head.unionByName(chars).dropDuplicates(["piece"])


def train_unigram(
    documents: DataFrame,
    vocab_size: int = 64,
    n_em: int = 3,
    max_piece_len: int = 8,
    seed_multiplier: int = 4,
    stats: dict | None = None,
    words_df: DataFrame | None = None,
) -> list[tuple[str, int]]:
    """Unigram-LM subword vocabulary training (Kudo 2018 — the
    SentencePiece trainer family BPE does not cover; reference repo
    has no counterpart, this is LLM-pipeline surface). Deterministic
    hard-EM (Viterbi-EM) in exact integer arithmetic:

    1. corpus collapses to the (word, freq) VOCABULARY (the only
       corpus-sized shuffle — same architecture as train_bpe);
    2. seed pieces = top substrings by weighted count (in-row
       transform + vocab-sized aggregate, all JVM);
    3. each EM round re-segments every word by integer-exact Viterbi
       (Arrow-batched mapInPandas over the vocab with the piece
       table broadcast — piece tables are bounded, a few thousand
       rows, so they travel as a plain dict) and re-estimates piece
       counts from chosen segmentations (vocab-sized aggregate);
    4. prune to ``vocab_size`` by (count desc, piece asc), keeping
       all single characters.

    Returns the final piece list [(piece, count)] sorted
    (count desc, piece asc) — the model a segmenter ships. Every
    step is corpus-size-independent after (1); EM rounds are
    ``n_em`` Spark jobs over the vocabulary. Bit-identical to the
    pure-Python reference spec (pinned in tests): all score
    comparisons are bigint cross-multiplications, no floats
    anywhere.

    Driver-memory contract (why there is no ``driver_vocab_max``
    escape hatch like ``train_bpe``'s): BPE's driver fast path
    collects the full (word, freq) CORPUS vocabulary — unbounded in
    corpus size, hence the gated fallback. This trainer NEVER
    collects the word vocabulary; the only driver materializations
    are PIECE tables: the seed (``limit(n_seed)`` + one row per
    distinct character) and each E-step's piece counts (keyed by the
    current piece set, so ≤ the seed size by construction). Both are
    ≤ ``vocab_size·seed_multiplier + |alphabet|`` rows — a few
    thousand — at ANY corpus size; growing the corpus only grows the
    distributed (word, freq) side. ``stats['driver_rows']`` reports
    the largest collect actually taken (bound pinned in
    tests/test_curation_ops.py::test_train_unigram_driver_rows_bounded)."""
    import pandas as pd  # noqa: F401 (mapInPandas contract)

    words = (
        word_vocab(documents).localCheckpoint()
        if words_df is None
        else words_df
    )
    seed = _unigram_seed(words, vocab_size * seed_multiplier, max_piece_len)
    pieces = {r["piece"]: int(r["c"]) for r in seed.collect()}
    driver_rows = len(pieces)
    rounds = 0
    for _ in range(n_em):
        rounds += 1
        total = sum(pieces.values())
        cnt, mx = dict(pieces), max_piece_len

        def _estep(batches, _c=cnt, _t=total, _m=mx):
            import pandas as pd

            for pdf in batches:
                out = {}
                for word, freq in zip(pdf["word"], pdf["freq"]):
                    for p in _unigram_viterbi(word, _c, _t, _m):
                        out[p] = out.get(p, 0) + int(freq)
                yield pd.DataFrame(
                    {"piece": list(out), "c": list(out.values())}
                )

        used = (
            words.mapInPandas(_estep, "piece string, c long")
            .groupBy("piece")
            .agg(F.sum("c").alias("c"))
            .collect()
        )
        driver_rows = max(driver_rows, len(used))
        new = {r["piece"]: int(r["c"]) for r in used}
        # single chars survive with zero count so every word stays
        # segmentable after any prune
        pieces = {
            p: new.get(p, 0)
            for p in pieces
            if p in new or len(p) == 1
        }
    ranked = sorted(pieces.items(), key=lambda kv: (-kv[1], kv[0]))
    kept = ranked[:vocab_size] + [
        (p, c) for p, c in ranked[vocab_size:] if len(p) == 1
    ]
    if stats is not None:
        stats["rounds"] = rounds
        stats["n_pieces"] = len(kept)
        stats["driver_rows"] = driver_rows
    return sorted(kept, key=lambda kv: (-kv[1], kv[0]))


def unigram_segment(
    documents: DataFrame,
    pieces: list[tuple[str, int]],
    max_piece_len: int = 8,
    words_df: DataFrame | None = None,
) -> DataFrame:
    """Segment the corpus vocabulary with a trained unigram piece
    table: one row per distinct word with freq, piece count, joined
    pieces, and three integer-exact CERTIFICATES a SQL oracle can
    hash-cover (the t_bpe_encode pattern): roundtrip (pieces re-concat
    to the word), known (every piece is in the table), local_opt (no
    adjacent chosen pair merges into a vocabulary piece with
    c_m * total > c_i * c_j — a consequence of Viterbi optimality).

    The corpus collapses to the (word, freq) vocabulary first; the
    Viterbi UDF is Arrow-batched and vocab-sized, the piece table a
    broadcast dict — nothing corpus-sized in Python at any scale."""
    cnt = dict(pieces)
    total = sum(cnt.values())
    mx = max_piece_len

    def _seg(batches, _c=cnt, _t=total, _m=mx):
        import pandas as pd

        for pdf in batches:
            rows = []
            for word, freq in zip(pdf["word"], pdf["freq"]):
                seq = _unigram_viterbi(word, _c, _t, _m)
                local_opt = True
                for a, b in zip(seq, seq[1:]):
                    m = _c.get(a + b)
                    if m is not None and m * _t > _c[a] * _c[b]:
                        local_opt = False
                rows.append(
                    (
                        word,
                        int(freq),
                        len(seq),
                        " ".join(seq),
                        "".join(seq) == word,
                        all(p in _c for p in seq),
                        local_opt,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "word",
                    "freq",
                    "n_pieces",
                    "pieces",
                    "cert_roundtrip",
                    "cert_known",
                    "cert_local_opt",
                ],
            )

    words = word_vocab(documents) if words_df is None else words_df
    return words.mapInPandas(
        _seg,
        "word string, freq long, n_pieces int, pieces string, "
        "cert_roundtrip boolean, cert_known boolean, cert_local_opt boolean",
    )


# ------------------------------------------------------------- wordpiece

_WP_SYMS_EXPR = (
    "transform(sequence(1, char_length(word)), i -> CASE WHEN i = 1 "
    "THEN substring(word, 1, 1) "
    "ELSE concat('##', substring(word, i, 1)) END)"
)


def _wp_merged(left: str, right: str) -> str:
    """WordPiece merged token: the right symbol's continuation marker
    folds away (non-initial symbols are ALWAYS ##-prefixed — initial
    merges mint unmarked tokens, continuation merges keep the left
    symbol's ## prefix)."""
    return left + (right[2:] if right.startswith("##") else right)


def _wp_scored_pairs(syms: DataFrame) -> DataFrame:
    """Scored adjacent-pair table over a (syms array, freq) frame —
    the block wordpiece_pair_scores AND every train_wordpiece
    iterative round share: pair counts + symbol counts (vocab-sized
    aggregates), two BROADCAST joins (symbol tables are
    alphabet-sized at any corpus scale — declared, never left to
    statistics), and the likelihood score. The denominator casts
    EACH count to double BEFORE multiplying: a bigint l_count ×
    r_count product overflows silently past ~3e9-count symbols
    (reachable far below the 100 TB design point), while
    double·double is one extra correctly-rounded step both engines
    replay identically. Exact ordering still comes from the
    Fraction re-rank (trainer) / integer columns (gate oracle)."""
    pair_counts = (
        syms.select(
            "freq",
            F.explode(
                F.expr(
                    "zip_with(slice(syms, 1, greatest(size(syms) - 1, 0)), "
                    "slice(syms, 2, greatest(size(syms) - 1, 0)), "
                    "(a, b) -> struct(a AS l, b AS r))"
                )
            ).alias("p"),
        )
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").alias("pair_count"))
    )
    sym_counts = (
        syms.select("freq", F.explode("syms").alias("sym"))
        .groupBy("sym")
        .agg(F.sum("freq").alias("c"))
    )
    return (
        pair_counts.join(
            F.broadcast(
                sym_counts.select(
                    F.col("sym").alias("l"), F.col("c").alias("l_count")
                )
            ),
            "l",
        )
        .join(
            F.broadcast(
                sym_counts.select(
                    F.col("sym").alias("r"), F.col("c").alias("r_count")
                )
            ),
            "r",
        )
        .select(
            "l",
            "r",
            "pair_count",
            "l_count",
            "r_count",
            (
                F.col("pair_count").cast("double")
                / (
                    F.col("l_count").cast("double")
                    * F.col("r_count").cast("double")
                )
            ).alias("score"),
        )
    )


def wordpiece_pair_scores(
    documents: DataFrame,
    topn: int | None = None,
    words_df: DataFrame | None = None,
) -> DataFrame:
    """First WordPiece-trainer iteration (Schuster & Nakajima 2012 —
    the BERT tokenizer family): adjacent-symbol pairs over the
    ##-marked character sequences, scored by the likelihood ratio
    count(pair) / (count(left) · count(right)) — the rule that
    separates WordPiece from BPE's raw-count argmax.

    Same 100 TB shape as ``bpe_pair_counts``: the corpus collapses to
    the (word, freq) VOCABULARY first (the only corpus-sized
    shuffle); symbol marking, pair extraction, and both count
    aggregates are vocab-sized in-row transforms + grouped sums, all
    JVM. The score divides exact bigint counts as one double — both
    engines' correctly-rounded division of identical integers, so the
    ranking is oracle-replayable (no ln anywhere, the t_tfidf rule).
    """
    words = word_vocab(documents) if words_df is None else words_df
    syms = words.select("freq", F.expr(_WP_SYMS_EXPR).alias("syms"))
    scored = _wp_scored_pairs(syms)
    if topn is not None:
        from pyspark.sql import Window

        # TakeOrderedAndProject does the global cut; the rank window
        # then runs over ≤ topn rows (never the full pair table)
        w = Window.orderBy(F.col("score").desc(), "l", "r")
        return (
            scored.orderBy(F.col("score").desc(), "l", "r")
            .limit(topn)
            .withColumn("rk", F.row_number().over(w).cast("long"))
        )
    return scored


def _driver_wordpiece(
    vocab: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Exact sequential WordPiece over a collected (word, freq)
    vocabulary with incremental pair/symbol-count maintenance. Score
    comparisons are EXACT rationals (Fraction — bigint cross-
    multiplication under the hood), ties (l, r) ascending; merges
    apply leftmost-first non-overlapping, the BPE convention."""
    from collections import Counter, defaultdict
    from fractions import Fraction

    def mark(w: str) -> list[str]:
        return [w[0]] + ["##" + ch for ch in w[1:]]

    words: list[tuple[list[str], int]] = [(mark(w), f) for w, f in vocab]
    pair_counts: Counter = Counter()
    sym_counts: Counter = Counter()
    index: defaultdict = defaultdict(set)
    for wi, (syms, f) in enumerate(words):
        for s in syms:
            sym_counts[s] += f
        for p in zip(syms, syms[1:]):
            pair_counts[p] += f
            index[p].add(wi)
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and pair_counts:
        best = min(
            pair_counts.items(),
            key=lambda kv: (
                -Fraction(kv[1], sym_counts[kv[0][0]] * sym_counts[kv[0][1]]),
                kv[0],
            ),
        )[0]
        merges.append(best)
        left, right = best
        merged = _wp_merged(left, right)
        for wi in list(index.get(best, ())):
            syms, f = words[wi]
            old_p = Counter(zip(syms, syms[1:]))
            old_s = Counter(syms)
            res: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new_p = Counter(zip(res, res[1:]))
            new_s = Counter(res)
            words[wi] = (res, f)
            for s in old_s.keys() | new_s.keys():
                d = (new_s[s] - old_s[s]) * f
                if d:
                    sym_counts[s] += d
                    if sym_counts[s] <= 0:
                        del sym_counts[s]
            for p in old_p.keys() | new_p.keys():
                d = (new_p[p] - old_p[p]) * f
                if d:
                    pair_counts[p] += d
                    if pair_counts[p] <= 0:
                        del pair_counts[p]
                if new_p[p]:
                    index[p].add(wi)
                else:
                    index[p].discard(wi)
    return merges


def _wp_piece_list(alphabet: list[str], merges) -> list[str]:
    """Shipped piece list: alphabet then minted merge tokens in merge
    order, DEDUPLICATED keep-first — two different merge pairs can
    mint the same token string (e.g. (a,##bc) and (ab,##c) both mint
    'a##bc'-shaped pieces), and a shipped vocab file must not carry a
    duplicate entry (r10 review)."""
    seen: set[str] = set()
    out: list[str] = []
    for piece in alphabet + [_wp_merged(l, r) for l, r in merges]:
        if piece not in seen:
            seen.add(piece)
            out.append(piece)
    return out


def train_wordpiece(
    documents: DataFrame,
    n_merges: int = 10,
    stats: dict | None = None,
    driver_vocab_max: int = 200_000,
    rerank_window: int = 64,
) -> list[str]:
    """WordPiece vocabulary training — the third production tokenizer
    family next to ``train_bpe`` (raw-count argmax) and
    ``train_unigram`` (Viterbi-EM prune): repeatedly merge the
    adjacent symbol pair maximizing count(pair) /
    (count(left)·count(right)), leftmost-first in every word.
    Returns the PIECE list a tokenizer ships: the corpus alphabet
    (word-initial chars + ## continuations, sorted) followed by the
    minted merge tokens in merge order.

    ONE merge per round, by design: unlike BPE — where a batch of
    symbol-disjoint top pairs is provably order-independent
    (``_safe_merge_batch``) — the WordPiece score couples EVERY pair
    through its denominator: merging (a, b) lowers count(a) and
    count(b), which RAISES the score of every other pair touching a
    or b, so no contiguous-prefix independence argument transfers.

    Distributed shape mirrors ``train_bpe``: the corpus collapses to
    the (word, freq) vocabulary once; the driver fast path collects
    it (same bounded ``driver_vocab_max`` probe + contract) and runs
    the exact incremental trainer; the iterative path keeps symbol
    sequences as vocab-sized array rows — each round is one pair
    aggregate + one symbol aggregate, a ``limit(rerank_window)``
    driver fetch ordered by the double score, an EXACT Fraction
    re-rank of that window (double ordering alone could misrank
    scores closer than one ulp; any exact-max pair lies within 1 ulp
    of the double max, so it is inside the window unless
    ``rerank_window`` pairs tie there — raise the window for
    pathological corpora), and one in-row fold applying the merge.
    """
    words_vocab = word_vocab(documents).localCheckpoint()
    if driver_vocab_max:
        probe = words_vocab.limit(driver_vocab_max + 1).count()
        if probe <= driver_vocab_max:
            vocab = [(r["word"], r["freq"]) for r in words_vocab.collect()]
            merges = _driver_wordpiece(vocab, n_merges)
            alphabet = sorted(
                {
                    s
                    for w, _ in vocab
                    for s in ([w[0]] + ["##" + ch for ch in w[1:]])
                }
            )
            if stats is not None:
                stats["rounds"] = 1
                stats["path"] = "driver"
                stats["n_merges"] = len(merges)
            return _wp_piece_list(alphabet, merges)
    if stats is not None:
        stats["path"] = "iterative"
    from fractions import Fraction

    words = words_vocab.select(
        F.expr(_WP_SYMS_EXPR).alias("syms"), "freq"
    ).localCheckpoint()
    alphabet = sorted(
        r["sym"]
        for r in words.select(F.explode("syms").alias("sym"))
        .distinct()
        .collect()
    )
    merges: list[tuple[str, str]] = []
    rounds = 0
    while len(merges) < n_merges:
        top = (
            _wp_scored_pairs(words)
            .orderBy(F.col("score").desc(), "l", "r")
            .limit(rerank_window)
            .collect()
        )
        rounds += 1
        if not top:
            break
        best = min(
            top,
            key=lambda r: (
                -Fraction(
                    int(r["pair_count"]),
                    int(r["l_count"]) * int(r["r_count"]),
                ),
                (r["l"], r["r"]),
            ),
        )
        left, right = best["l"], best["r"]
        merges.append((left, right))
        merged = _wp_merged(left, right)
        words = words.select(
            F.expr(
                "aggregate(syms, CAST(array() AS array<string>), (acc, x) "
                f"-> CASE WHEN size(acc) > 0 AND element_at(acc, -1) = "
                f"{_sql_str(left)} AND x = {_sql_str(right)} "
                f"THEN concat(slice(acc, 1, size(acc) - 1), "
                f"array({_sql_str(merged)})) "
                "ELSE concat(acc, array(x)) END)"
            ).alias("syms"),
            "freq",
        ).localCheckpoint()
    if stats is not None:
        stats["rounds"] = rounds
        stats["n_merges"] = len(merges)
    return _wp_piece_list(alphabet, merges)


def wordpiece_encode(
    documents: DataFrame,
    pieces: list[str],
    by: str | None = None,
    unk_token: str = "[UNK]",
    words_df: DataFrame | None = None,
) -> DataFrame:
    """Segment the corpus vocabulary with a trained WordPiece table:
    greedy longest-match-first (the BERT tokenizer), non-initial
    positions matching ## pieces; a word with any unmatchable
    position collapses to ``unk_token``. One row per distinct word
    (optionally per string ``by`` stratum) with freq, piece count,
    joined pieces, and CERTIFICATES in the t_bpe_encode pattern:
    roundtrip (pieces re-concatenate to the word, ## stripped),
    known (every piece in the table), greedy (INDEPENDENTLY
    re-checked: no LONGER table piece matches at any chosen
    position), is_unk. On an UNK row the certificates stay honest:
    roundtrip is FALSE, known reports the unk token's own table
    membership, greedy is vacuously true — a caller asserting
    bool_and(cert_roundtrip) therefore FAILS on a piece table that
    cannot tokenize its input instead of seeing all-green.

    Scale: corpus → (word, freq) vocabulary first; the matcher is an
    Arrow-batched ``mapInPandas`` over vocab-sized rows with the
    piece set a broadcast Python set (piece tables are
    vocab-size-bounded) — nothing corpus-sized in Python."""
    piece_set = set(pieces)
    mx = max((len(p) for p in pieces), default=1)

    def _seg(batches, _v=piece_set, _m=mx, _u=unk_token):
        import pandas as pd

        def match(word):
            out, i, n = [], 0, len(word)
            while i < n:
                hit = None
                for ln in range(min(_m, n - i), 0, -1):
                    cand = word[i : i + ln] if i == 0 else "##" + word[i : i + ln]
                    if cand in _v:
                        hit = cand
                        i += ln
                        break
                if hit is None:
                    return None
                out.append(hit)
            return out

        for pdf in batches:
            rows = []
            keys = [c for c in pdf.columns if c not in ("word", "freq")]
            for tup in pdf.itertuples(index=False):
                word, freq = tup.word, tup.freq
                seq = match(word)
                if seq is None:
                    # honest certificates for the UNK row (r10 review:
                    # hardcoded Trues made them vacuously green on
                    # unmatchable words): roundtrip is FALSE (the unk
                    # token does not rebuild the word), known reports
                    # whether the unk token itself is in the table,
                    # greedy is vacuously true (no chosen positions).
                    rows.append(
                        tuple(getattr(tup, k) for k in keys)
                        + (word, int(freq), 1, _u, False, _u in _v,
                           True, True)
                    )
                    continue
                rebuilt = seq[0] + "".join(p[2:] for p in seq[1:])
                greedy = True
                pos = 0
                for p in seq:
                    plain = p if pos == 0 else p[2:]
                    for ln in range(
                        min(_m, len(word) - pos), len(plain), -1
                    ):
                        cand = (
                            word[pos : pos + ln]
                            if pos == 0
                            else "##" + word[pos : pos + ln]
                        )
                        if cand in _v:
                            greedy = False
                    pos += len(plain)
                rows.append(
                    tuple(getattr(tup, k) for k in keys)
                    + (
                        word,
                        int(freq),
                        len(seq),
                        " ".join(seq),
                        rebuilt == word,
                        all(p in _v for p in seq),
                        greedy,
                        False,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=keys
                + [
                    "word",
                    "freq",
                    "n_pieces",
                    "pieces",
                    "cert_roundtrip",
                    "cert_known",
                    "cert_greedy",
                    "is_unk",
                ],
            )

    keys = [by] if by else []
    if words_df is not None:
        words = words_df
    else:
        words = (
            documents.select(*keys, F.explode(_tokens()).alias("word"))
            .filter(F.col("word") != "")
            .groupBy(*keys, "word")
            .agg(F.count(F.lit(1)).alias("freq"))
        )
    # derive each by-key's Arrow type from the actual input schema
    # (a hardcoded 'string' would break integer strata at runtime)
    word_types = dict(words.dtypes)
    key_schema = "".join(f"{k} {word_types[k]}, " for k in keys)
    return words.mapInPandas(
        _seg,
        f"{key_schema}word string, freq long, n_pieces int, pieces string, "
        "cert_roundtrip boolean, cert_known boolean, cert_greedy boolean, "
        "is_unk boolean",
    )


# ----------------------------------------------------- bigram LM quality

# integer-exact 2^-20-lattice binary logarithm of a positive BIGINT:
# floor(log2 k) from the bit length plus linear mantissa interpolation
# between powers of two — monotone in k, max |err vs log2| ~0.086,
# PURE integer ops, so both engines replay it bit-for-bit (the
# log-free idiom of t_tvd/t_tfidf, extended to LM scoring where a
# libm log2 could tie-split the lattice floor by one ulp).
def _sql_ilog2_q20(k: str) -> str:
    """Spark SQL fragment (bin() bit length + shiftleft + DIV).

    The mantissa splits on e >= 20: (k − 2^e)·2^20 overflows BIGINT
    once k passes ~2^43 (a few-TB reference corpus — inside the
    design range), but for e >= 20 the divisor 2^e is an exact
    multiple of 2^20, so floor((k−2^e)·2^20 / 2^e) =
    (k−2^e) DIV 2^(e−20) with no wide intermediate; below e = 20 the
    product is < 2^40 and the direct form is exact."""
    e = f"(length(bin({k})) - 1)"
    p = f"shiftleft(CAST(1 AS BIGINT), {e})"
    return (
        f"(CAST({e} AS BIGINT) * 1048576 + "
        f"CASE WHEN {e} >= 20 THEN (({k}) - {p}) DIV ({p} DIV 1048576) "
        f"ELSE (({k}) - {p}) * 1048576 DIV {p} END)"
    )


def duckdb_ilog2_q20(k: str) -> str:
    """The same lattice log as a DuckDB fragment (printf('%b') bit
    length + << + //) — exported so oracle SQL replays the scorer.
    Same e >= 20 overflow-free mantissa split as _sql_ilog2_q20."""
    e = f"(length(printf('%b', {k})) - 1)"
    p = f"(CAST(1 AS BIGINT) << {e})"
    return (
        f"(CAST({e} AS BIGINT) * 1048576 + "
        f"CASE WHEN {e} >= 20 THEN (({k}) - {p}) // ({p} // 1048576) "
        f"ELSE (({k}) - {p}) * 1048576 // {p} END)"
    )


def _adjacent_token_pairs(df: DataFrame, *keys: str) -> DataFrame:
    """(prev, cur) whitespace-token bigrams per row, empty tokens
    dropped. The token array is PROJECTED FIRST (the chunk_documents
    r10 lesson: an alias in the same select as the explode leaves
    Catalyst re-splitting inside the Generate bound) and the pairing
    is a zip_with over two slices rather than a ``size >= 2`` filter
    + sequence: the filter's predicate gets PUSHED INTO the scan
    where it re-evaluates the split per row (filter + project = two
    tokenizations, the same no-CSE class) — the slice form yields an
    empty pair array for 0/1-token rows with no predicate at all."""
    toks = df.select(
        *keys, F.filter(_tokens(), lambda x: x != F.lit("")).alias("_toks")
    )
    n1 = "greatest(size(_toks) - 1, 0)"
    return (
        toks.select(
            *keys,
            F.explode(
                F.expr(
                    f"zip_with(slice(_toks, 1, {n1}), "
                    f"slice(_toks, 2, {n1}), "
                    "(a, b) -> struct(a AS prev, b AS cur))"
                )
            ).alias("_p"),
        )
        .select(*keys, "_p.prev", "_p.cur")
    )


def bigram_lm_scores(
    documents: DataFrame,
    reference: DataFrame | None = None,
    buckets: int = 3,
) -> DataFrame:
    """CCNet-style language-model quality scoring (Wenzek et al.
    2020 — the curation step that buckets a crawl into head/middle/
    tail by LM fit against a trusted reference corpus): train a
    Laplace-smoothed bigram LM on ``reference`` (p(cur|prev) =
    (c2+1)/(c1+V)), score every document by its mean per-bigram
    log-probability, rank, and cut into ``buckets`` tiers (1 = best
    fit; ``keep`` = not the worst tier, CCNet's head+middle).

    Determinism contract: every log is the integer-exact lattice
    ``_sql_ilog2_q20`` (bit-length + linear mantissa, 2^-20 units) —
    term_q = ilog(c2+1) − ilog(c1+V), all bigint; the only double is
    the final mean (one correctly-rounded division of identical
    integers), so a SQL oracle replays scores, buckets, and keep
    flags bit-for-bit (``duckdb_ilog2_q20`` is the oracle-side twin).
    OOV tokens and unseen bigrams fall out of the left joins as
    c=0 — exactly Laplace smoothing, no special cases.

    Scale shape: reference collapses to vocab-sized unigram/bigram
    count tables (map-side combinable aggregates); scoring is the
    corpus bigram explode joined against those tables on their keys
    and ONE per-doc re-aggregate. Measured on real prose (SCALE.md
    round-11, scripts/heaps_study.py): the UNIGRAM vocabulary is
    Heaps-sublinear (beta ~ 0.5-0.6) but the BIGRAM table grows with
    beta ~ 0.7-0.86 and its post-combine shuffle rows with beta ~
    0.9 — near-linear, NOT vocabulary-flat, when the LM is trained
    on the corpus it scores (reference=None). The 100 TB posture is
    therefore CCNet's own: pass a bounded trusted ``reference``
    (Wenzek et al. train on Wikipedia, not on the crawl), which
    makes both LM tables constant-size, lets AQE broadcast them, and
    turns scoring into a map-only pass with zero corpus-keyed
    shuffle; self-training is for bounded corpora. Either way the
    global tier cut reuses the bucketed distributed rank
    (plans/analytics._global_ntile_rank — never an
    empty-partitionBy window). Docs with <2 tokens score NULL and
    land in the worst tier, keep=false.

    Returns (doc_id, n_bigrams, lm_score_q, avg_lm_score,
    ppl_bucket, keep)."""
    from ..plans.analytics import _global_ntile_rank

    ref = documents if reference is None else reference
    rt = ref.select(F.explode(_tokens()).alias("w")).filter(
        F.col("w") != ""
    )
    uni = rt.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    vrow = uni.agg(F.count(F.lit(1)).alias("__V"))
    big = (
        _adjacent_token_pairs(ref)
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    terms = (
        _adjacent_token_pairs(documents, "doc_id")
        .join(big, ["prev", "cur"], "left")
        .join(
            uni.select(F.col("w").alias("prev"), "c1"), "prev", "left"
        )
        .crossJoin(F.broadcast(vrow))
        .select(
            "doc_id",
            F.expr(
                f"{_sql_ilog2_q20('coalesce(c2, 0) + 1')} - "
                f"{_sql_ilog2_q20('coalesce(c1, 0) + __V')}"
            ).alias("term_q"),
        )
    )
    per_doc = terms.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("term_q").alias("lm_score_q"),
    )
    from ..caching import scoped_persist

    # scored feeds BOTH the rank path and the final join — without a
    # persist the whole score pipeline (bigram explode + two LM
    # joins + re-aggregate) executes once per consumer (3 document
    # scans in the physical plan, caught by the r10 plan audit)
    scored = scoped_persist(
        documents.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "lm_score_q",
            (
                F.col("lm_score_q").cast("double") / F.col("n_bigrams")
            ).alias("avg_lm_score"),
        )
    )
    rankable = scored.filter(F.col("n_bigrams") > 0)
    n_row = rankable.agg(F.count(F.lit(1)).alias("__n"))
    ranked = (
        _global_ntile_rank(
            rankable, "avg_lm_score", "doc_id", "__rk", ascending=False
        )
        .crossJoin(F.broadcast(n_row))
        .select(
            "doc_id",
            # integer DIV, not double /: the tier formula must be
            # exact at any rank magnitude (and oracle-replayable)
            F.expr(
                f"CAST(1 + ((__rk - 1) * {int(buckets)}) DIV __n AS INT)"
            ).alias("ppl_bucket"),
        )
    )
    return (
        scored.join(ranked, "doc_id", "left")
        .select(
            "doc_id",
            "n_bigrams",
            "lm_score_q",
            "avg_lm_score",
            F.coalesce("ppl_bucket", F.lit(buckets)).alias("ppl_bucket"),
            (F.coalesce("ppl_bucket", F.lit(buckets)) < buckets).alias(
                "keep"
            ),
        )
    )


# ------------------------------------------------------------ gopher rules

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_rules(
    documents: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    text_col: str = "text",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """The Gopher quality-rule battery (Rae et al. 2021, App. A1.1 —
    the named heuristic filter set most pretraining pipelines run
    before model-based scoring), per document: word-count bounds,
    mean word length in [3, 10], symbol-to-word ratio (# and
    ellipsis) ≤ 0.1, ≤ 90% bullet-started lines, ≤ 30%
    ellipsis-ended lines, ≥ 80% words with an alphabetic character,
    and ≥ 2 distinct Gopher stop words. Emits the raw counts, the
    ratio metrics, one boolean per named rule, and the conjunction
    ``pass_gopher``.

    Determinism + scale: ONE projection, no shuffle, no UDF — token
    and line arrays are projected first (the r10 single-split
    idiom), every metric is integer counts with at most one
    correctly-rounded division, and every rule THRESHOLD compares
    integers cross-multiplied (bullet·10 ≤ lines·9), so a SQL oracle
    replays each flag bit-for-bit at any scale."""
    # text_col/carry exist for composition (web_pipeline runs the
    # battery over the C4-cleaned text while carrying that stage's
    # flags through); defaults reproduce the original single-table
    # shape bit-for-bit.
    toks = documents.select(
        "doc_id",
        *carry,
        F.col(text_col).alias("text"),
        F.filter(_tokens(text_col), lambda x: x != F.lit("")).alias("_toks"),
        F.split(F.col(text_col), "\n").alias("_lines"),
    )
    n_words = F.size("_toks").cast("long")
    n_lines = F.size("_lines").cast("long")
    sum_word_len = F.aggregate(
        F.transform("_toks", lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n_alpha_words = F.size(
        F.filter("_toks", lambda w: w.rlike("[a-zA-Z]"))
    ).cast("long")
    n_hash = (
        F.length("text") - F.length(F.replace(F.col("text"), F.lit("#")))
    ).cast("long")
    n_ellipsis = (
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit("...")))
        )
        / 3
        + (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit("…")))
        )
    ).cast("long")
    n_bullet_lines = F.size(
        F.filter(
            "_lines",
            lambda ln: F.ltrim(ln).startswith("-")
            | F.ltrim(ln).startswith("*")
            | F.ltrim(ln).startswith("•"),
        )
    ).cast("long")
    n_ellipsis_lines = F.size(
        F.filter(
            "_lines",
            lambda ln: F.rtrim(ln).endswith("...")
            | F.rtrim(ln).endswith("…"),
        )
    ).cast("long")
    n_stop = sum(
        (
            F.array_contains("_toks", w).cast("int")
            for w in GOPHER_STOPWORDS
        ),
        F.lit(0),
    ).cast("long")
    m = toks.select(
        "doc_id",
        *carry,
        n_words.alias("n_words"),
        n_lines.alias("n_lines"),
        sum_word_len.alias("sum_word_len"),
        n_alpha_words.alias("n_alpha_words"),
        n_hash.alias("n_hash"),
        n_ellipsis.alias("n_ellipsis"),
        n_bullet_lines.alias("n_bullet_lines"),
        n_ellipsis_lines.alias("n_ellipsis_lines"),
        n_stop.alias("n_stopwords_hit"),
    )
    w = F.col("n_words")
    return m.select(
        "*",
        # ratios NULL on empty docs by explicit guard (zero-divisor
        # double semantics differ between engines)
        F.when(
            w > 0, F.col("sum_word_len").cast("double") / w
        ).alias("mean_word_len"),
        F.when(
            w > 0,
            (F.col("n_hash") + F.col("n_ellipsis")).cast("double") / w,
        ).alias("symbol_word_ratio"),
        ((w >= min_words) & (w <= max_words)).alias("rule_word_count"),
        # 3 ≤ mean ≤ 10 as integer cross-multiplication: exact, no
        # division anywhere near the flag
        (
            (F.col("sum_word_len") >= 3 * w)
            & (F.col("sum_word_len") <= 10 * w)
        ).alias("rule_mean_word_len"),
        (
            (F.col("n_hash") + F.col("n_ellipsis")) * 10 <= w
        ).alias("rule_symbol_ratio"),
        (F.col("n_bullet_lines") * 10 <= F.col("n_lines") * 9).alias(
            "rule_bullet_lines"
        ),
        (F.col("n_ellipsis_lines") * 10 <= F.col("n_lines") * 3).alias(
            "rule_ellipsis_lines"
        ),
        (F.col("n_alpha_words") * 10 >= w * 8).alias("rule_alpha_words"),
        (F.col("n_stopwords_hit") >= 2).alias("rule_stopwords"),
    ).select(
        "*",
        (
            F.col("rule_word_count")
            & F.col("rule_mean_word_len")
            & F.col("rule_symbol_ratio")
            & F.col("rule_bullet_lines")
            & F.col("rule_ellipsis_lines")
            & F.col("rule_alpha_words")
            & F.col("rule_stopwords")
        ).alias("pass_gopher"),
    )


# GPT-2-style pre-tokenizer pattern (Radford et al. 2019's BPE
# pre-split), in the LOOKAHEAD-FREE variant: the original's
# `\s+(?!\S)` tail needs negative lookahead, which RE2 (DuckDB's
# engine) rejects, so — like every RE2-based reimplementation — the
# two whitespace alternatives collapse into one `\s+`. Consequence:
# a space run before a word is ONE whitespace token and the word
# token carries no leading space (the original splits off all-but-one
# space); everything else (contraction suffixes, letter runs, digit
# runs, punctuation runs) matches the original. Alternation is
# leftmost-FIRST in both Java regex and RE2 (neither is POSIX
# longest-match), so the two engines tokenize identically. The
# whitespace class is spelled out as [ \t\n\x0B\f\r] — exactly Java's
# \s — because RE2's \s lacks \x0B (ADVICE r10): with a bare \s a
# vertical-tab char would be a whitespace pretoken in Spark but a
# punctuation pretoken in the DuckDB oracle. Spelling it out is a
# no-op for Spark and pins the oracle to the same tokenization.
_GPT2_PRETOKEN_RE = (
    r"'(?:s|t|d|m|ll|ve|re)"
    r"| ?\p{L}+"
    r"| ?\p{N}+"
    r"| ?[^ \t\n\x0B\f\r\p{L}\p{N}]+"
    r"|[ \t\n\x0B\f\r]+"
)


def pretoken_stats(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document GPT-2 pre-tokenizer census: extract the pretoken
    stream and count each class (letter words, number runs,
    punctuation runs, whitespace runs, contraction suffixes), plus a
    RECONSTRUCTION certificate — the pattern's alternatives cover
    every character, so concatenating the matches must rebuild the
    document byte-for-byte (``recon_ok``); any silently-dropped
    character flips it false.

    One projection: regexp_extract_all once, class counts are codegen
    HOF filters over the projected array (the r10 single-split
    idiom), no shuffle, no UDF — map-only at 100 TB."""
    arr = F.regexp_extract_all(F.col(text_col), F.lit(_GPT2_PRETOKEN_RE), 0)
    toks = documents.select(
        "doc_id", F.col(text_col).alias("_text"), arr.alias("_pre")
    )

    def _cls(pat: str) -> Column:
        return F.size(
            F.filter("_pre", lambda t: t.rlike(pat))
        ).cast("long")

    return toks.select(
        "doc_id",
        F.size("_pre").cast("long").alias("n_pretokens"),
        F.size(F.array_distinct("_pre")).cast("long").alias("n_unique"),
        _cls(r"^ ?\p{L}+$").alias("n_word_toks"),
        _cls(r"^ ?\p{N}+$").alias("n_num_toks"),
        _cls(r"^ ?[^ \t\n\x0B\f\r\p{L}\p{N}]+$").alias("n_punct_toks"),
        _cls(r"^[ \t\n\x0B\f\r]+$").alias("n_space_toks"),
        _cls(r"^'(?:s|t|d|m|ll|ve|re)$").alias("n_contractions"),
        (F.array_join("_pre", "") == F.col("_text")).alias("recon_ok"),
    )


def pretoken_vocab(
    documents: DataFrame, topn: int = 100, text_col: str = "text"
) -> DataFrame:
    """Global GPT-2 pretoken vocabulary: explode the pretoken stream,
    count every distinct pretoken, keep the ``topn`` by (count desc,
    token asc) — the exact first step of training a byte-level BPE at
    corpus scale (count pretokens first; merges never cross pretoken
    boundaries, Radford et al. 2019).

    Scale: the explode is map-side; the groupBy shuffles one narrow
    (token, partial-count) row per distinct pretoken per partition
    (map-side combine), so shuffle volume is vocabulary-sized, not
    corpus-sized; the top-N is a TakeOrderedAndProject."""
    arr = F.regexp_extract_all(F.col(text_col), F.lit(_GPT2_PRETOKEN_RE), 0)
    return (
        documents.select(F.explode(arr).alias("pretoken"))
        .groupBy("pretoken")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pretoken").asc())
        .limit(topn)
    )


# Gopher repetition thresholds (Rae et al. 2021, Table A1): a doc is
# repetitious when ANY fraction exceeds its bound. Stored as percent
# so every flag is an integer cross-multiplication.
GOPHER_REP_THRESHOLDS = {
    "dup_line_frac": 30,
    "dup_para_frac": 30,
    "dup_line_char_frac": 20,
    "dup_para_char_frac": 20,
    "top_2gram_char_frac": 20,
    "top_3gram_char_frac": 18,
    "top_4gram_char_frac": 16,
    "dup_5gram_char_frac": 15,
    "dup_6gram_char_frac": 14,
    "dup_7gram_char_frac": 13,
    "dup_8gram_char_frac": 12,
    "dup_9gram_char_frac": 11,
    "dup_10gram_char_frac": 10,
}


def _ngram_strings(toks: Column, n: int) -> Column:
    """Array of space-joined n-grams of a token array (empty when the
    doc has fewer than n tokens), built as its OWN array so a
    downstream explode never drags the token array along rows.

    The generator bound clamps to 1 and the result is re-sliced to
    the true count: Spark's ``sequence(1, 0)`` DESCENDS to [1, 0]
    (step defaults to -1 when start > stop), which would feed
    slice(start=0) and throw on short/empty docs."""
    cnt = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    full = F.transform(
        F.sequence(F.lit(1), F.greatest(cnt, F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.slice(full, 1, cnt)


def gopher_repetition_rules(
    documents: DataFrame,
    ngram_top: tuple[int, ...] = (2, 3, 4),
    ngram_dup: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """The Gopher REPETITION battery (Rae et al. 2021, Table A1 — the
    other half of the heuristic filter, next to
    ``gopher_quality_rules``), per document:

    * duplicate line / paragraph fraction — occurrences beyond the
      first over total lines / paragraphs — and their character-mass
      twins (chars in duplicate occurrences over total chars);
    * top-n-gram character fraction for n in ``ngram_top``: the most
      frequent n-gram's count × its TOKEN characters (string length
      minus the n−1 joining spaces) over total token chars, so the
      fraction never exceeds 1 and shares the coverage metric's
      separator-free denominator; a count tie elects the
      lexicographically GREATEST n-gram (one struct max — both
      engines order (count, ngram) pairs identically);
    * duplicate-n-gram character COVERAGE for n in ``ngram_dup``: the
      fraction of token characters inside ANY occurrence of any
      duplicated n-gram — positions are UNIONED before weighing, so
      overlapping occurrences never double count (the standard
      implementation of the paper's rule).

    Emits the integer numerators/denominators, double fractions, one
    flag per metric at the paper's threshold (integer
    cross-multiplied: frac·100 ≤ pct·denominator — never a
    thresholded float), and the conjunction ``pass_repetition``.

    Scale shape: line/paragraph metrics are ONE codegen projection
    (array_distinct + length folds, no shuffle). ALL nine n-gram
    families share one unioned pipeline: per-n n-gram arrays are
    projected (each string built once), posexploded to narrow
    (doc_id, n, pos, ngram) rows, counted with ONE window exchange on
    (doc_id, n, ngram), then split into the top-mass aggregate and
    the coverage path (dup positions → sequence-explode ≤ n rows each
    → distinct → token-length weighting against a position table that
    never shuffles). Shuffle volume everywhere is n-gram-count-sized;
    document text never crosses an exchange. Everything partitions by
    doc_id — embarrassingly parallel across documents at 100 TB."""
    from pyspark.sql import Window

    from ..caching import scoped_persist

    toks_arr = F.filter(_tokens(), lambda x: x != F.lit(""))
    # Pin the map parallelism explicitly (the holt_smoothing /
    # rolling_quartiles precedent): nine explode pipelines of
    # per-doc string building hang off this frame, and a
    # single-row-group input would otherwise run ALL of it on one
    # core before the first natural exchange. One narrow text
    # shuffle up front; AQE never coalesces an explicit repartition.
    par = documents.sparkSession.sparkContext.defaultParallelism
    proj = scoped_persist(
        documents.repartition(par, "doc_id").select(
            "doc_id",
            toks_arr.alias("_toks"),
            F.split(F.col("text"), "\n").alias("_lines"),
            F.split(F.col("text"), "\n\n").alias("_paras"),
        )
    )

    def _char_sum(arr) -> Column:
        return F.aggregate(
            F.transform(arr, lambda s: F.length(s).cast("long")),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        )

    stats = proj.select(
        "doc_id",
        F.size("_lines").cast("long").alias("n_lines"),
        F.size(F.array_distinct("_lines")).cast("long").alias("n_dist_lines"),
        _char_sum("_lines").alias("line_chars"),
        _char_sum(F.array_distinct("_lines")).alias("dist_line_chars"),
        F.size("_paras").cast("long").alias("n_paras"),
        F.size(F.array_distinct("_paras")).cast("long").alias("n_dist_paras"),
        _char_sum("_paras").alias("para_chars"),
        _char_sum(F.array_distinct("_paras")).alias("dist_para_chars"),
        _char_sum("_toks").alias("tok_chars"),
    )

    def _ng_union(ns) -> DataFrame:
        # ONE fused explode for all n (r15): the r14 shape unioned
        # one explode pipeline per n, which copied the proj subtree
        # |ns| times into the plan (driver-side analysis cost — the
        # profiled wall was ~half plan construction) and re-read the
        # persisted proj once per branch at execution. Here each doc
        # row builds every n's (n, pos, ngram) structs in-row and a
        # single explode emits the identical row set: posexplode's
        # 0-based pos is reproduced by the transform index lambda, an
        # under-n-tokens doc contributes an empty array to the
        # flatten exactly as its posexplode branch contributed no
        # rows. Paired A/B at sf0.1 (back-to-back sessions): warm
        # walls [5.8, 6.2, 7.8] → [5.9, 5.9, 5.1], cold 28.2 → 19.5,
        # full-plan Exchange count 32 → 25 and Union nodes 4 → 0
        # (plans/r15/t_gopher_repetition_{before,after}.txt).
        def _tag(n):
            # factory, not a default-arg lambda: PySpark reads the
            # lambda's arity to pick the HOF signature
            return lambda s, i: F.struct(
                F.lit(n).alias("n"), i.alias("pos"), s.alias("ng")
            )

        per_n = [
            F.transform(_ngram_strings(F.col("_toks"), n), _tag(n))
            for n in ns
        ]
        return proj.select(
            "doc_id", F.explode(F.flatten(F.array(*per_n))).alias("s")
        ).select("doc_id", "s.n", "s.pos", "s.ng")

    # The top and coverage paths get DISJOINT explode pipelines: a
    # shared window-counted frame would re-execute the whole union
    # once per consumer (measured 2 Window nodes = 2x the explode
    # work), and the top path never needs per-occurrence positions —
    # a plain two-level aggregate (map-side combine on (doc, n, ng))
    # replaces the window there outright.
    tops = (
        _ng_union(ngram_top)
        .groupBy("doc_id", "n", "ng")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id", "n")
        .agg(F.max(F.struct("c", "ng")).alias("top"))
        .select(
            "doc_id",
            "n",
            # token characters only — length(ng) minus its n-1 joining
            # spaces — so the fraction shares the coverage path's
            # separator-free denominator and never exceeds 1
            (
                F.col("top.c") * (F.length("top.ng") - (F.col("n") - 1))
            ).cast("long").alias("tc"),
        )
        .groupBy("doc_id")
        .pivot("n", list(ngram_top))
        .agg(F.first("tc"))
        .select(
            "doc_id",
            *[
                F.col(str(n)).alias(f"top_{n}gram_chars")
                for n in ngram_top
            ],
        )
    )

    # duplicated-n-gram coverage: union the covered token positions,
    # then weigh by token length from a never-shuffled position table.
    # The window count survives HERE only — this path needs every
    # occurrence's position, so a groupBy can't replace it.
    w = Window.partitionBy("doc_id", "n", "ng")
    cnt = _ng_union(ngram_dup).withColumn("c", F.count(F.lit(1)).over(w))
    dup_pos = (
        cnt.filter(F.col("c") > 1)
        .select(
            "doc_id",
            "n",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.col("n") - 1)
            ).alias("tpos"),
        )
        .distinct()
    )
    tok_tbl = proj.select(
        "doc_id",
        F.posexplode(
            F.transform("_toks", lambda t: F.length(t).cast("long"))
        ).alias("tpos", "tlen"),
    )
    covs = (
        dup_pos.join(tok_tbl, ["doc_id", "tpos"])
        .groupBy("doc_id")
        .pivot("n", list(ngram_dup))
        .sum("tlen")
        .select(
            "doc_id",
            *[
                F.col(str(n)).alias(f"dup_{n}gram_chars")
                for n in ngram_dup
            ],
        )
    )

    joined = (
        stats.join(tops, "doc_id", "left").join(covs, "doc_id", "left")
    )
    fill = {f"top_{n}gram_chars": 0 for n in ngram_top}
    fill.update({f"dup_{n}gram_chars": 0 for n in ngram_dup})
    joined = joined.fillna(fill)

    def _frac(num: Column, den: Column) -> Column:
        return F.when(den > 0, num.cast("double") / den).otherwise(
            F.lit(0.0)
        )

    dup_line = F.col("n_lines") - F.col("n_dist_lines")
    dup_para = F.col("n_paras") - F.col("n_dist_paras")
    dup_line_ch = F.col("line_chars") - F.col("dist_line_chars")
    dup_para_ch = F.col("para_chars") - F.col("dist_para_chars")
    out = joined.select(
        "*",
        _frac(dup_line, F.col("n_lines")).alias("dup_line_frac"),
        _frac(dup_para, F.col("n_paras")).alias("dup_para_frac"),
        _frac(dup_line_ch, F.col("line_chars")).alias("dup_line_char_frac"),
        _frac(dup_para_ch, F.col("para_chars")).alias("dup_para_char_frac"),
        *[
            _frac(F.col(f"top_{n}gram_chars"), F.col("tok_chars")).alias(
                f"top_{n}gram_char_frac"
            )
            for n in ngram_top
        ],
        *[
            _frac(F.col(f"dup_{n}gram_chars"), F.col("tok_chars")).alias(
                f"dup_{n}gram_char_frac"
            )
            for n in ngram_dup
        ],
    )
    T = GOPHER_REP_THRESHOLDS
    rules = [
        (dup_line * 100 <= F.col("n_lines") * T["dup_line_frac"]).alias(
            "rule_dup_line"
        ),
        (dup_para * 100 <= F.col("n_paras") * T["dup_para_frac"]).alias(
            "rule_dup_para"
        ),
        (
            dup_line_ch * 100
            <= F.col("line_chars") * T["dup_line_char_frac"]
        ).alias("rule_dup_line_char"),
        (
            dup_para_ch * 100
            <= F.col("para_chars") * T["dup_para_char_frac"]
        ).alias("rule_dup_para_char"),
        *[
            (
                F.col(f"top_{n}gram_chars") * 100
                <= F.col("tok_chars") * T[f"top_{n}gram_char_frac"]
            ).alias(f"rule_top_{n}gram")
            for n in ngram_top
        ],
        *[
            (
                F.col(f"dup_{n}gram_chars") * 100
                <= F.col("tok_chars") * T[f"dup_{n}gram_char_frac"]
            ).alias(f"rule_dup_{n}gram")
            for n in ngram_dup
        ],
    ]
    out = out.select("*", *rules)
    names = (
        ["rule_dup_line", "rule_dup_para", "rule_dup_line_char",
         "rule_dup_para_char"]
        + [f"rule_top_{n}gram" for n in ngram_top]
        + [f"rule_dup_{n}gram" for n in ngram_dup]
    )
    conj = None
    for nm in names:
        conj = F.col(nm) if conj is None else (conj & F.col(nm))
    return out.select("*", conj.alias("pass_repetition"))


def entropy_stats(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Character-entropy quality signal (the compression-ratio-style
    filter of Dolma/RefinedWeb pipelines, in its exactly-replayable
    form): per document, the entropy of the character distribution —
    low marks repetitive boilerplate, high marks random/binary junk.
    The log is the repo's 2^-20 LATTICE log (``_sql_ilog2_q20`` — the
    piecewise-LINEAR log2 surrogate the CCNet scorer uses): exact at
    powers of two, within 0.0861 bits of log2 elsewhere, and — the
    point — pure INTEGER arithmetic, so where true Shannon entropy is
    irrational and engine-dependent, ``h_num_q20 = N·ilog2(N) −
    Σ cᵢ·ilog2(cᵢ)`` hash-pins bit-for-bit. Also emits the
    one-division double ``entropy_bits`` (same surrogate), the
    distinct-character count, and the whitespace char count.

    Plan: one char explode per doc (rows = characters — narrow), a
    (doc, char) count aggregate with map-side combine, a per-doc
    re-aggregate. Everything partitions on doc_id; the lattice log is
    the same ``_sql_ilog2_q20`` integer fragment the CCNet LM scorer
    uses, exact to 2^62 counts."""
    chars = documents.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.col(text_col), ""), lambda c: c != F.lit("")
            )
        ).alias("ch"),
    )
    counts = chars.groupBy("doc_id", "ch").agg(
        F.count(F.lit(1)).alias("c")
    )
    ilog_c = F.expr(_sql_ilog2_q20("c"))
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_chars"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_chars"),
        F.sum(F.col("c") * ilog_c).cast("long").alias("sum_c_ilog"),
        # explicit class: Java's \s covers \x0B, RE2's does not — the
        # spelled-out set parses identically in both engines
        F.sum(
            F.when(
                F.col("ch").rlike("^[ \t\n\x0b\f\r]$"), F.col("c")
            ).otherwise(0)
        ).cast("long").alias("n_ws_chars"),
    )
    n = F.col("n_chars")
    ilog_n = F.expr(_sql_ilog2_q20("n_chars"))
    h_num = (n * ilog_n - F.col("sum_c_ilog")).cast("long")
    out = per_doc.select(
        "doc_id",
        "n_chars",
        "n_distinct_chars",
        "n_ws_chars",
        h_num.alias("h_num_q20"),
        (h_num.cast("double") / (n.cast("double") * 1048576.0)).alias(
            "entropy_bits"
        ),
    )
    # empty docs never reach the explode — a LEFT join from the id
    # column re-attaches them as zero rows. (An anti-join + union
    # would consume per_doc twice and re-execute the whole char
    # explode per consumer — the same double-execution class the
    # repetition battery's build measured and removed.)
    zero = F.lit(0).cast("long")
    return documents.select("doc_id").join(out, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_chars", zero).alias("n_chars"),
        F.coalesce("n_distinct_chars", zero).alias("n_distinct_chars"),
        F.coalesce("n_ws_chars", zero).alias("n_ws_chars"),
        F.coalesce("h_num_q20", zero).alias("h_num_q20"),
        F.coalesce("entropy_bits", F.lit(0.0)).alias("entropy_bits"),
    )
