"""Property-based checks (hypothesis): the algebraic guarantees the
engine's semantics rest on, probed with random inputs.

Each example spins Spark jobs, so example counts stay small — these
probe shapes of data the deterministic fixtures don't."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from building_coffee_commodity_trading_data_warehouse_spark.operators.joins import merge_upsert
from building_coffee_commodity_trading_data_warehouse_spark.operators.windows import (
    with_trailing_means,
)

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_rows = st.lists(
    st.tuples(st.integers(0, 9), st.integers(-1000, 1000)),
    min_size=0,
    max_size=12,
)


@_settings
@given(target=_rows, staged=_rows)
def test_merge_upsert_is_dict_update(spark, target, staged):
    """merge_upsert == dict.update on the natural key: staged rows win
    on collision, unmatched target rows survive, and re-applying the
    same snapshot changes nothing."""
    # unique keys per frame (the natural-key contract)
    t = {k: v for k, v in target}
    s = {k: v for k, v in staged}
    schema = "k int, v int"
    tdf = spark.createDataFrame(list(t.items()) or [], schema)
    sdf = spark.createDataFrame(list(s.items()) or [], schema)

    merged = merge_upsert(tdf, sdf, ["k"])
    got = {r["k"]: r["v"] for r in merged.collect()}
    want = {**t, **s}
    assert got == want

    again = merge_upsert(merged, sdf, ["k"])
    assert {r["k"]: r["v"] for r in again.collect()} == want


@_settings
@given(
    prices=st.lists(st.integers(1, 10**6), min_size=1, max_size=40),
    frame=st.sampled_from([1, 3, 7]),
)
def test_trailing_mean_matches_python(spark, prices, frame):
    """with_trailing_means == a plain python trailing mean, for any
    series and frame size (prefix-sum rewrite is semantics-preserving)."""
    rows = [
        (dt.date(2020, 1, 1) + dt.timedelta(days=i), float(p) / 100)
        for i, p in enumerate(prices)
    ]
    df = spark.createDataFrame(rows, "d date, price double")
    w = Window.partitionBy(F.lit(1)).orderBy("d")
    out = with_trailing_means(df, "price", w, (frame,))
    got = [r[f"ma_{frame}"] for r in out.orderBy("d").collect()]
    vals = [float(p) / 100 for p in prices]
    for i, g in enumerate(got):
        lo = max(0, i - frame)
        want = sum(vals[lo : i + 1]) / (i + 1 - lo)
        assert abs(g - want) < 1e-9


def test_connected_components_path_graph(spark):
    """Min-label propagation needs diameter-many rounds: a 5-node path
    (1-2-3-4-5) must fully collapse to component 1, a separate edge
    (8,9) to 8, and the convergence certificate must stop the loop."""
    from building_coffee_commodity_trading_data_warehouse_spark.operators.dedup import (
        connected_components,
        neardup_clusters,
        neardup_dedup,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (8, 9)], "doc_a long, doc_b long"
    )
    comp = {r["node"]: r["comp"] for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 8: 8, 9: 8}

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in [1, 2, 3, 4, 5, 7, 8, 9]], "doc_id long, text string"
    )
    cl = neardup_clusters(docs, pairs).collect()
    got = {r["doc_id"]: (r["cluster_id"], r["is_keeper"]) for r in cl}
    # singleton 7 keeps itself; only min ids are keepers
    assert got[7] == (7, 1)
    assert got[1] == (1, 1) and got[5] == (1, 0) and got[9] == (8, 0)
    kept = sorted(r["doc_id"] for r in neardup_dedup(docs, pairs).collect())
    assert kept == [1, 7, 8]


def test_hash_split_stability_and_chunk_reconstruction(spark):
    """Split assignment is a function of (seed, id) alone — subsetting
    the corpus never moves a surviving row between splits — and
    non-overlapping chunking (stride == chunk) reconstructs the
    original token stream exactly."""
    from building_coffee_commodity_trading_data_warehouse_spark.operators.curate import (
        chunk_documents,
        hash_sample,
        hash_split,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(i % 7 + 1))) for i in range(200)],
        "doc_id long, text string",
    )
    full = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    half = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs.filter(F.col("doc_id") % 2 == 0)).collect()
    }
    assert all(full[k] == v for k, v in half.items())
    assert set(full.values()) == {"train", "val", "test"}

    s = hash_sample(docs, 0.5).count()
    assert 60 <= s <= 140  # deterministic, roughly half

    chunks = chunk_documents(docs, chunk=3, stride=3).collect()
    rebuilt = {}
    for r in sorted(chunks, key=lambda r: (r["doc_id"], r["chunk_id"])):
        rebuilt[r["doc_id"]] = (rebuilt.get(r["doc_id"], "") + " " + r["chunk_text"]).strip()
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert rebuilt == orig


_pack_rows = st.lists(
    st.tuples(
        st.integers(0, 2),    # shard
        st.integers(0, 5),    # doc_id
        st.integers(0, 3),    # chunk_id
        st.integers(1, 300),  # n_tokens
    ),
    min_size=0,
    max_size=14,
    unique_by=lambda r: (r[0], r[1], r[2]),
)


@given(_pack_rows, st.integers(16, 512))
@_settings
def test_pack_chunks_matches_prefix_sum(spark, rows, max_tokens):
    """pack_offset is exactly the per-shard prefix sum of token counts
    in (doc_id, chunk_id) order, and pack_id = offset // max_tokens —
    for ANY chunk stream and pack size."""
    from building_coffee_commodity_trading_data_warehouse_spark.operators.curate import pack_chunks

    df = spark.createDataFrame(
        [(str(s), d, c, n) for s, d, c, n in rows],
        "shard string, doc_id long, chunk_id long, n_tokens long",
    )
    got = {
        (r["shard"], r["doc_id"], r["chunk_id"]): (r["pack_offset"], r["pack_id"])
        for r in pack_chunks(df, max_tokens=max_tokens).collect()
    }
    by_shard: dict = {}
    for s, d, c, n in sorted(rows):
        off = by_shard.get(str(s), 0)
        assert got[(str(s), d, c)] == (off, off // max_tokens), (s, d, c)
        by_shard[str(s)] = off + n


@given(st.integers(0, 1000), st.floats(0.0, 1.0))
@_settings
def test_stratified_sample_composes_with_hash_sample(spark, n, frac):
    """A single-stratum stratified sample with fraction f and seed s is
    EXACTLY hash_sample(f, seed=s): same bucket, same threshold."""
    from building_coffee_commodity_trading_data_warehouse_spark.operators.curate import (
        hash_sample,
        stratified_sample,
    )

    df = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit("only").alias("stratum")
    )
    a = {r["doc_id"] for r in hash_sample(df, frac, seed="z").collect()}
    b = {
        r["doc_id"]
        for r in stratified_sample(df, "stratum", {"only": frac}, seed="z").collect()
    }
    assert a == b


@_settings
@given(
    vals=st.lists(
        st.integers(-9999, 9999).map(lambda c: c / 100.0), min_size=1, max_size=30
    ),
)
def test_winsorize_preserves_rows_and_bounds(spark, vals):
    """Winsorization never drops or invents rows, every clipped value
    sits inside the fences, and unclipped values pass through
    bit-identical."""
    from building_coffee_commodity_trading_data_warehouse_spark.operators.curate import winsorize

    df = spark.createDataFrame(
        [(i, "t", v) for i, v in enumerate(vals)],
        "event_id long, event_type string, value double",
    )
    out = winsorize(df).collect()
    assert len(out) == len(vals)
    lo = min(r["clipped"] for r in out)
    hi = max(r["clipped"] for r in out)
    for r in out:
        if r["was_clipped"]:
            assert r["clipped"] in (lo, hi)
        else:
            assert r["clipped"] == r["value"]


@_settings
@given(
    vals=st.lists(st.integers(0, 4999).map(lambda c: c / 100.0), min_size=1, max_size=40),
    nbins=st.sampled_from([2, 5, 10, 25]),
)
def test_histogram_partitions_every_row_once(spark, vals, nbins):
    """Bucket counts are a partition of the table: they sum to the row
    count, and every bucket id is within [0, nbins)."""
    from building_coffee_commodity_trading_data_warehouse_spark.operators.aggregates import histogram

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = histogram(df, "x", 0.0, 50.0, nbins).collect()
    assert sum(r["n_rows"] for r in out) == len(vals)
    assert all(0 <= r["bucket"] < nbins for r in out)


@_settings
@given(
    n=st.integers(1, 60),
    k=st.integers(1, 8),
)
def test_group_sample_size_is_min_k_groupsize(spark, n, k):
    """Each group yields exactly min(k, |group|) rows."""
    from building_coffee_commodity_trading_data_warehouse_spark.operators.curate import group_sample

    df = spark.range(n).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).cast("string").alias("grp")
    )
    sizes = {}
    for r in df.collect():
        sizes[r["grp"]] = sizes.get(r["grp"], 0) + 1
    out = group_sample(df, k, group_col="grp").collect()
    got = {}
    for r in out:
        got[r["grp"]] = got.get(r["grp"], 0) + 1
    assert got == {g: min(k, s) for g, s in sizes.items()}


@_settings
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(codec="utf-8", categories=("L", "N", "P", "Zs", "Cc")),
            max_size=60,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_clean_text_idempotent(spark, texts):
    """clean(clean(x)) == clean(x): the hygiene pass is a projection
    onto its own fixed-point set — rerunning a pipeline stage never
    changes already-clean data."""
    from building_coffee_commodity_trading_data_warehouse_spark.operators import curate

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    once = curate.clean_text(df).select("doc_id", F.col("clean_text").alias("text"))
    twice = curate.clean_text(once)
    for r in once.join(
        twice.select("doc_id", F.col("clean_text").alias("again")), "doc_id"
    ).collect():
        assert r["text"] == r["again"]


@_settings
@given(texts=st.lists(st.text(alphabet="abc d", max_size=30), min_size=1, max_size=6))
def test_oov_rate_bounds(spark, texts):
    """0 ≤ n_oov ≤ n_tokens and the rate is their exact quotient."""
    from building_coffee_commodity_trading_data_warehouse_spark.operators import textstats

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for r in textstats.oov_rate(df, vocab_k=2).collect():
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        if r["n_tokens"]:
            assert r["oov_rate"] == r["n_oov"] / r["n_tokens"]


@_settings
@given(
    hashes=st.lists(
        st.integers(0, (1 << 64) - 1), min_size=2, max_size=10, unique=True
    )
)
def test_phash_pairs_equal_brute_force(spark, hashes):
    """The banded candidate join must return EXACTLY the pairs within
    the Hamming budget — the pigeonhole guarantee says no pair within
    distance max_distance can be missed, and the popcount verify drops
    every farther pair a band accidentally co-buckets."""
    from building_coffee_commodity_trading_data_warehouse_spark.sources import multimodal

    rows = [(i, h >> 32, h & 0xFFFFFFFF) for i, h in enumerate(hashes)]
    df = spark.createDataFrame(rows, "doc_id long, hash_hi long, hash_lo long")
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in multimodal.phash_pairs(df, max_distance=3).collect()
    }
    want = {}
    for i, a in enumerate(hashes):
        for j in range(i + 1, len(hashes)):
            d = bin(a ^ hashes[j]).count("1")
            if d <= 3:
                want[(i, j)] = d
    assert got == want


def test_market_concentration_single_supplier_is_monopoly(spark):
    """One supplier per nation ⇒ HHI exactly 1.0 — the closed-form
    anchor for the Σrev²/(Σrev)² identity."""
    import datetime as dt

    from building_coffee_commodity_trading_data_warehouse_spark.plans import analytics

    li = spark.createDataFrame(
        [(1, 1, 1, 1, 10.0, 100.0, 0.1, 0.0, "N", "O", dt.datetime(2024, 1, 1))],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp",
    )
    supp = spark.createDataFrame([(1, "S1", 0, 0.0)],
        "s_suppkey long, s_name string, s_nationkey long, s_acctbal double")
    nat = spark.createDataFrame([(0, "N0", 0)],
        "n_nationkey long, n_name string, n_regionkey long")
    r = analytics.market_concentration(li, supp, nat).collect()[0]
    assert r["hhi"] == 1.0
    assert r["n_suppliers"] == 1


def test_mad_stats_single_element_group(spark):
    import datetime as dt

    from building_coffee_commodity_trading_data_warehouse_spark.operators import aggregates

    ev = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1, "solo", 42.5, None)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    r = aggregates.mad_stats(ev).collect()[0]
    assert (r["median_val"], r["mad"], r["n_rows"]) == (42.5, 0.0, 1)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 16) - 1),
            st.integers(min_value=0, max_value=(1 << 16) - 1),
        ),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_zorder_interleave_roundtrip(spark, pairs):
    """zorder_value is a bijection on [0,2^16)²: de-interleaving the
    engine-computed Morton code recovers both inputs exactly."""
    from building_coffee_commodity_trading_data_warehouse_spark.plans.maintenance import (
        zorder_value,
    )

    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pairs)], "i long, x long, y long"
    )
    got = df.select(
        "x", "y", zorder_value(F.col("x"), F.col("y"), bits=16).alias("z")
    ).collect()

    def deinterleave(z):
        x = y = 0
        for i in range(16):
            x |= ((z >> (2 * i)) & 1) << i
            y |= ((z >> (2 * i + 1)) & 1) << i
        return x, y

    for r in got:
        assert deinterleave(r["z"]) == (r["x"], r["y"])


@given(
    st.integers(min_value=-1000, max_value=1000),
    st.integers(min_value=1, max_value=5000),
    st.lists(st.integers(min_value=0, max_value=5000), min_size=2, max_size=30),
)
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_quantize_code_bounds_and_monotone(spark, lo, span, offsets):
    """quantize_code lands in [0, 2^bits) for every in-range input,
    maps the endpoints to 0 and 2^bits−1, and preserves order."""
    from building_coffee_commodity_trading_data_warehouse_spark.plans.maintenance import (
        quantize_code,
    )

    hi = lo + span
    vals = sorted({lo, hi, *[lo + o % (span + 1) for o in offsets]})
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = [
        r["q"]
        for r in df.select(quantize_code(F.col("v"), lo, hi, bits=10).alias("q"))
        .orderBy("q")
        .collect()
    ]
    assert all(0 <= q < (1 << 10) for q in got)
    by_val = {
        r["v"]: r["q"]
        for r in df.select(
            "v", quantize_code(F.col("v"), lo, hi, bits=10).alias("q")
        ).collect()
    }
    assert by_val[lo] == 0 and by_val[hi] == (1 << 10) - 1
    ordered = [by_val[v] for v in vals]
    assert ordered == sorted(ordered)


def test_active_users_emits_gap_days(spark):
    """A gap longer than the WAU window must surface as dau=0/wau=0
    rows — not a silently compressed time axis."""
    import datetime as dt

    from building_coffee_commodity_trading_data_warehouse_spark.operators.aggregates import (
        active_users,
    )

    rows = [
        (1, 10, dt.datetime(2024, 1, 1, 9), "click", 1.0),
        (2, 11, dt.datetime(2024, 1, 20, 9), "click", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    got = {r["day"]: (r["dau"], r["wau"]) for r in active_users(df, 7).collect()}
    assert len(got) == 20  # every calendar day from Jan 1 to Jan 20
    assert got["2024-01-01"] == (1, 1)
    assert got["2024-01-07"] == (0, 1)   # inside the trailing window
    assert got["2024-01-10"] == (0, 0)   # the gap: present, zeroed
    assert got["2024-01-20"] == (1, 1)


@_settings
@given(
    vals=st.lists(
        st.integers(-500, 500).map(lambda c: c / 4.0),
        min_size=1,
        max_size=20,
    )
)
def test_cusum_prefix_min_rewrite_equals_recursion(spark, vals):
    """The distributed rewrite s_t = P_t − min prefix P must equal the
    textbook recursion s_t = max(0, s_{t−1} + (x_t − μ)) for ANY
    series. Quarter-valued inputs keep the n-scaled lattice deviations
    exact, so the equality is bit-level, not approximate."""
    from building_coffee_commodity_trading_data_warehouse_spark.operators.windows import (
        cusum_changepoints,
    )

    rows = [
        (i, dt.datetime(2024, 1, 1, 0, 0, i % 60), 1, "t", v, "{}")
        for i, v in enumerate(vals)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        r["event_id"]: r["cusum_stat"]
        for r in cusum_changepoints(ev, h_units=10).collect()
    }
    import math

    n = len(vals)
    lat = 1 << 16
    # floor toward -inf, like F.floor
    cents = [math.floor(v * lat) for v in vals]
    sx = sum(cents)
    s = 0
    for i, c in enumerate(cents):
        s = max(0, s + (n * c - sx))
        assert got[i] == s / (n * lat), (i, got[i], s / (n * lat))


@_settings
@given(
    vals=st.lists(
        st.floats(
            min_value=-1000, max_value=1000,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1,
        max_size=15,
    )
)
def test_holt_fold_bit_equal_to_python(spark, vals):
    """The Holt applyInPandas fold must be bit-identical to a plain
    Python left fold for ARBITRARY doubles — dyadic α/β multiply
    exactly and additions are single correctly-rounded ops executed in
    the same order, so no tolerance is needed."""
    from building_coffee_commodity_trading_data_warehouse_spark.operators.windows import (
        holt_smoothing,
    )

    rows = [
        (i, dt.datetime(2024, 1, 1, 0, 0, i % 60), 1, "t", v, "{}")
        for i, v in enumerate(vals)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        r["seq"]: (r["level"], r["trend"])
        for r in holt_smoothing(ev).collect()
    }
    lvl, tr = vals[0], 0.0
    for i, y in enumerate(vals):
        if i > 0:
            new = 0.5 * y + 0.5 * (lvl + tr)
            tr = 0.25 * (new - lvl) + 0.75 * tr
            lvl = new
        assert got[i + 1] == (lvl, tr), (i, got[i + 1], (lvl, tr))


@_settings
@given(
    toks=st.lists(st.integers(1, 9), min_size=1, max_size=15),
    budget=st.integers(2, 12),
)
def test_shard_plan_is_exact_prefix_packing(spark, toks, budget):
    """shard_plan's distributed prefix sum must equal the sequential
    greedy packing for any token-length sequence and budget: exact
    cumulative sums in id order, shard = floor(prefix/budget), shards
    monotone."""
    from building_coffee_commodity_trading_data_warehouse_spark.operators.curate import (
        shard_plan,
    )

    docs = spark.createDataFrame(
        [(i, "w " * (t - 1) + "w") for i, t in enumerate(toks)],
        "doc_id long, text string",
    )
    out = sorted(
        shard_plan(docs, tokens_per_shard=budget).collect(),
        key=lambda r: r["doc_id"],
    )
    cum = 0
    shards = []
    for r, t in zip(out, toks):
        assert r["n_tokens"] == t
        assert r["shard"] == cum // budget
        cum += t
        assert r["cum_tokens"] == cum
        shards.append(r["shard"])
    assert shards == sorted(shards)


@_settings
@given(
    texts=st.lists(
        st.text(alphabet="abcd ", min_size=3, max_size=30),
        min_size=2,
        max_size=10,
    ),
    n_batches=st.integers(1, 5),
)
def test_minhash_rollup_merge_theorem(spark, texts, n_batches):
    """sig(A∪B) = elementwise min(sig A, sig B) must hold for ANY
    corpus and batch count — merge_ok is a theorem, not a tolerance."""
    from building_coffee_commodity_trading_data_warehouse_spark.operators.dedup import (
        minhash_rollup_certify,
    )

    # pad so every doc has >= 2 tokens (a shingle-less corpus rightly
    # yields an empty signature table)
    docs = spark.createDataFrame(
        [(i, f"{t} pad tok", "s") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )
    out = minhash_rollup_certify(docs, k=4, n=2, n_batches=n_batches).collect()
    assert out and all(r["merge_ok"] == 1 for r in out)


def _ref_remove_spans(texts, n, min_docs):
    """Brute-force reference for remove_repeated_spans: enumerate all
    n-gram occurrences, keep spans in >= min_docs distinct docs, union
    the covered token positions per doc, rebuild."""
    toks = {i: t.split(" ") for i, t in enumerate(texts)}
    occ = {}
    for d, tk in toks.items():
        for p in range(len(tk) - n + 1):
            occ.setdefault(" ".join(tk[p : p + n]), []).append((d, p))
    hot = {s for s, os_ in occ.items() if len({d for d, _ in os_}) >= min_docs}
    out = {}
    for d, tk in toks.items():
        cov = set()
        for s in hot:
            for dd, p in occ.get(s, ()):
                if dd == d:
                    cov.update(range(p, p + n))
        kept = [t for i, t in enumerate(tk) if i not in cov]
        out[d] = (len(tk), len(cov), " ".join(kept))
    return out


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(st.sampled_from("ab"), min_size=1, max_size=12).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    n=st.integers(2, 4),
    min_docs=st.integers(2, 3),
)
def test_remove_repeated_spans_matches_reference(spark, docs, n, min_docs):
    """Random tiny-alphabet corpora maximize overlapping/adjacent
    repeated spans — the adversarial case for the gap-islands
    interval merge. Spark must equal the brute-force reference
    exactly (token counts, cut counts, reconstructed text)."""
    from building_coffee_commodity_trading_data_warehouse_spark.operators.dedup import (
        remove_repeated_spans,
    )

    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_cut"], r["text_clean"])
        for r in remove_repeated_spans(sdf, n=n, min_docs=min_docs).collect()
    }
    assert got == _ref_remove_spans(docs, n, min_docs)


def _ref_maximal_spans(texts, n, min_docs):
    """Brute-force reference for maximal_spans: enumerate n-gram
    occurrences, keep hot ones (>= min_docs distinct docs), merge
    overlapping/ADJACENT [p, p+n-1] ranges per doc into maximal
    intervals, slice the merged text, count distinct docs per maximal
    span text. Positions 1-based inclusive."""
    toks = {i: t.split(" ") for i, t in enumerate(texts)}
    occ = {}
    for d, tk in toks.items():
        for p in range(len(tk) - n + 1):
            occ.setdefault(" ".join(tk[p : p + n]), []).append((d, p))
    hot = {s for s, os_ in occ.items() if len({d for d, _ in os_}) >= min_docs}
    rows = []
    for d, tk in toks.items():
        ranges = sorted(
            (p, p + n - 1)
            for s in hot
            for dd, p in occ.get(s, ())
            if dd == d
        )
        merged = []
        for a, b in ranges:
            if merged and a <= merged[-1][1] + 1:  # overlap OR adjacent
                merged[-1] = (merged[-1][0], max(merged[-1][1], b))
            else:
                merged.append((a, b))
        for a, b in merged:
            rows.append((d, a + 1, b + 1, " ".join(tk[a : b + 1]), b - a + 1))
    ndocs = {}
    for d, _, _, s, _ in rows:
        ndocs.setdefault(s, set()).add(d)
    return sorted(
        (d, a, b, s, ln, len(ndocs[s])) for d, a, b, s, ln in rows
    )


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(st.sampled_from("ab"), min_size=1, max_size=12).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    n=st.integers(2, 4),
    min_docs=st.integers(2, 3),
)
def test_maximal_spans_matches_reference(spark, docs, n, min_docs):
    """Random tiny-alphabet corpora maximize overlapping AND adjacent
    hot windows — the two merge cases maximal_spans must coalesce.
    Spark must equal the brute-force reference exactly: positions,
    merged span text, and corpus-wide n_docs on the MAXIMAL text."""
    from building_coffee_commodity_trading_data_warehouse_spark.operators.dedup import (
        maximal_spans,
    )

    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = sorted(
        (r["doc_id"], r["start"], r["end"], r["span"], r["n_tokens"],
         r["n_docs"])
        for r in maximal_spans(sdf, n=n, min_docs=min_docs).collect()
    )
    assert got == _ref_maximal_spans(docs, n, min_docs)
