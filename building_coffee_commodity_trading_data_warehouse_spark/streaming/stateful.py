"""Custom stateful streaming operator via applyInPandasWithState.

Running per-user position tracker: every micro-batch folds its events
into persistent per-key state (event count, cumulative value, last
timestamp) and emits the updated snapshot — the streaming twin of a
running-total window, but with state the engine checkpoints and
restores. This is the extension point for operators the built-in
windowed aggregations can't express (per-key custom accumulators,
decaying counters, CEP-ish logic).

Scale: state lives in the state store partitioned by the grouping key;
each micro-batch shuffles only its delta. State per key is O(1) here —
bounded regardless of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

STATE_SCHEMA = "n_events long, total_micros long, last_ts timestamp"
OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, last_ts timestamp"
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Stateful per-user running totals. ``events`` must be a STREAMING
    DataFrame with (user_id, ts, value); each trigger emits one updated
    row per user seen in that batch.

    The running value total accumulates as INTEGER MICROS (each value
    rounded to 6 decimals — the repo-wide DECIMAL(38,6) policy of
    functions/exact.py): exact integer addition makes the emitted total
    independent of batch boundaries and row order, bit-identical to a
    decimal-sum oracle, where a naive float accumulator would drift per
    micro-batch.

    The tracker is a SELF-CONTAINED closure (imports inside, no module
    references): Spark's Python workers pickle it by value, so the
    operator runs even when this package isn't on the workers' path.
    """

    def _track(key, batches, state):
        import numpy as _np
        import pandas as _pd

        def _half_up_scaled(vals, decimals, scale):
            # HALF_UP (away from zero) on the double's EXACT decimal
            # expansion, matching the batch oracle's DECIMAL cast.
            # floor(x*scale + 0.5) alone double-rounds: x*scale is an
            # already-rounded multiply and +0.5 can carry a double
            # strictly below a half-tick across the boundary. Fast
            # vectorized path for the bulk; any element within a few
            # ulps of a half-tick is re-decided exactly via Decimal
            # (Decimal(float) is the exact binary expansion).
            scaled = vals * float(scale)
            out = _np.where(
                scaled >= 0,
                _np.floor(scaled + 0.5),
                _np.ceil(scaled - 0.5),
            ).astype("int64")
            frac = _np.abs(scaled - _np.trunc(scaled))
            risky = _np.abs(frac - 0.5) <= 4.0 * _np.spacing(
                _np.abs(scaled) + 1.0
            )
            if risky.any():
                from decimal import ROUND_HALF_UP, Decimal

                q = Decimal(1).scaleb(-decimals)
                for i in _np.nonzero(risky)[0]:
                    out[i] = int(
                        Decimal(float(vals[i]))
                        .quantize(q, rounding=ROUND_HALF_UP)
                        .scaleb(decimals)
                    )
            return out

        (user_id,) = key
        if state.exists:
            n, micros, last = state.get
        else:
            n, micros, last = 0, 0, None
        for pdf in batches:
            n += len(pdf)
            micros += int(
                _half_up_scaled(
                    pdf["value"].to_numpy(), 6, 1_000_000
                ).sum()
            )
            mx = pdf["ts"].max()
            last = mx if last is None or mx > last else last
        state.update((n, micros, last))
        yield _pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [micros / 1_000_000],
                "last_ts": [last],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        _track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ZSCORE_STATE_SCHEMA = "vals array<long>"
ZSCORE_OUTPUT_SCHEMA = (
    "event_id long, user_id long, ts timestamp, value double, "
    "n_obs long, is_outlier boolean"
)


def zscore_stream(events: DataFrame, window_rows: int = 50, z: int = 3) -> DataFrame:
    """Streaming twin of ``windows.zscore_outliers``: per-user trailing
    z-score anomaly flags over a live stream, with the last
    ``window_rows − 1`` ticks checkpointed as per-key state (a ring
    buffer of integer cents — O(window) per key, bounded forever).

    The decision is the same all-integer inequality as the batch
    operator — (n·c − Σc)² > z²·(n·Σc² − (Σc)²) on cents — so a drain
    of the stream is bit-identical to the batch flags: no float
    accumulator to drift across micro-batch boundaries. Within a batch
    rows are processed in (ts, event_id) order; across batches the
    tracker relies on the landing producer's in-order delivery per key
    (the log-structured-landing contract; out-of-order sources need a
    watermark reorder stage first).

    Self-contained closure: pickled by value, runs without this package
    on the workers' path."""
    zz = z * z
    hist = window_rows - 1

    def _flag(key, batches, state):
        import numpy as _np
        import pandas as _pd

        (user_id,) = key
        vals = list(state.get[0]) if state.exists else []
        pdf = _pd.concat(list(batches), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        # HALF_UP cents on the exact expansion, matching
        # zscore_outliers' DECIMAL(18,2) cast (np.round's half-even
        # ties and floor(x*100+0.5)'s carry both diverge on dyadics).
        sc = pdf["value"].to_numpy() * 100.0
        cents = _np.where(
            sc >= 0, _np.floor(sc + 0.5), _np.ceil(sc - 0.5)
        ).astype("int64")
        risky = _np.abs(
            _np.abs(sc - _np.trunc(sc)) - 0.5
        ) <= 4.0 * _np.spacing(_np.abs(sc) + 1.0)
        if risky.any():
            from decimal import ROUND_HALF_UP, Decimal

            v = pdf["value"].to_numpy()
            for i in _np.nonzero(risky)[0]:
                cents[i] = int(
                    Decimal(float(v[i]))
                    .quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
                    .scaleb(2)
                )
        arr = _np.concatenate([_np.asarray(vals, dtype="int64"), cents])
        c1 = _np.concatenate([[0], _np.cumsum(arr)])
        c2 = _np.concatenate([[0], _np.cumsum(arr * arr)])
        j = _np.arange(len(vals), len(arr))
        start = _np.maximum(0, j - hist)
        n = j - start + 1
        sx = c1[j + 1] - c1[start]
        sx2 = c2[j + 1] - c2[start]
        dev = n * arr[j] - sx
        flags = dev * dev > zz * (n * sx2 - sx * sx)
        # arr[-hist:] with hist=0 would be the WHOLE array (unbounded
        # state growth for window_rows=1) — slice from the length instead
        state.update((arr[len(arr) - hist :].tolist(),))
        yield _pd.DataFrame(
            {
                "event_id": pdf["event_id"].to_numpy(),
                "user_id": user_id,
                "ts": pdf["ts"],
                "value": pdf["value"],
                "n_obs": n,
                "is_outlier": flags,
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        _flag,
        outputStructType=ZSCORE_OUTPUT_SCHEMA,
        stateStructType=ZSCORE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Typed-state twin of ``running_user_totals`` on Spark 4's
    ``transformWithStateInPandas`` API (StatefulProcessor +
    ValueState): same exact integer-micros accumulation, same output
    schema — the forward-looking stateful surface with per-state-var
    typing, timers, and RocksDB-backed state.

    ENVIRONMENT GATE (fails loudly at the swap point, the multimodal
    'pil' convention): PySpark's TWS control channel speaks protobuf
    (pyspark.sql.streaming.proto.StateMessage_pb2); without the
    ``google.protobuf`` package the driver worker crashes at init
    with an opaque STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE, so
    this raises a clear NotImplementedError instead. The
    ``applyInPandasWithState`` twin covers identical semantics and is
    fully gated (st_stateful_totals)."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env-specific
        raise NotImplementedError(
            "transformWithStateInPandas needs the google.protobuf "
            "package (PySpark's typed-state wire protocol) — absent "
            "in this environment. Use running_user_totals "
            "(applyInPandasWithState) for the same semantics."
        ) from exc

    from pyspark.sql.streaming import StatefulProcessor

    class _Tracker(StatefulProcessor):
        def init(self, handle):
            self._totals = handle.getValueState(
                "totals", "n_events long, total_micros long"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as _pd

            n, micros = (
                self._totals.get() if self._totals.exists() else (0, 0)
            )
            last = None
            for pdf in rows:
                n += len(pdf)
                # same exact HALF_UP micros fold as running_user_totals
                from decimal import ROUND_HALF_UP, Decimal

                micros += sum(
                    int(
                        Decimal(float(v))
                        .quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
                        .scaleb(6)
                    )
                    for v in pdf["value"]
                )
                mx = pdf["ts"].max()
                last = mx if last is None or mx > last else last
            self._totals.update((n, micros))
            yield _pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [micros / 1_000_000],
                    "last_ts": [last],
                }
            )

        def close(self):
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_Tracker(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


CUSUM_STATE_SCHEMA = "p long, minp long"
CUSUM_OUTPUT_SCHEMA = (
    "event_id long, user_id long, ts timestamp, value double, "
    "n_obs long, cusum_stat double, is_alarm boolean"
)


def cusum_profile(static_events: DataFrame) -> DataFrame:
    """The batch PROFILING pass for ``cusum_stream``: per-user count
    and lattice value sum — exactly the quantities the batch
    ``windows.cusum_changepoints`` derives its reference mean from, so
    stream and batch share one definition of μ."""
    from pyspark.sql import functions as F

    c = F.floor(F.col("value") * F.lit(65536.0)).cast("long")
    return static_events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_obs"), F.sum(c).alias("sx")
    )


def cusum_stream(
    events: DataFrame, profile: DataFrame, h_units: int = 200
) -> DataFrame:
    """Streaming twin of ``windows.cusum_changepoints`` — the
    profile-from-batch / monitor-in-stream split a real deployment
    runs: the per-user reference (n, Σc) comes from a STATIC profiling
    table joined stream-static (scales to any user count — no
    driver-side dict), and the alarm statistic folds with TWO LONGS of
    per-key state (running P and its prefix minimum; the prefix-min
    identity makes the "sequential" recursion a pure streaming fold).

    All-integer like the batch twin, so a drain is bit-identical to
    the batch statistic row for row. In-order per-key delivery is the
    landing contract, as with the other trackers.
    """
    joined = events.join(profile, "user_id")

    def _fold(key, batches, state):
        import numpy as _np
        import pandas as _pd

        (user_id,) = key
        pdf = _pd.concat(list(batches), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        c = _np.floor(pdf["value"].to_numpy() * 65536.0).astype("int64")
        n = int(pdf["n_obs"].iloc[0])
        sx = int(pdf["sx"].iloc[0])
        d = n * c - sx
        ps = _np.cumsum(d)
        if state.exists:
            p0, minp0 = state.get
            ps = ps + p0
            run_min = _np.minimum(_np.minimum.accumulate(ps), minp0)
        else:
            # the prefix min includes the EMPTY prefix (P0 = 0), same
            # as the batch twin — a first positive deviation surfaces
            run_min = _np.minimum(_np.minimum.accumulate(ps), 0)
        s = ps - run_min
        state.update((int(ps[-1]), int(run_min[-1])))
        yield _pd.DataFrame(
            {
                "event_id": pdf["event_id"].to_numpy(),
                "user_id": user_id,
                "ts": pdf["ts"],
                "value": pdf["value"].to_numpy(),
                "n_obs": _np.full(len(pdf), n, dtype="int64"),
                "cusum_stat": s.astype("float64") / (n * 65536.0),
                "is_alarm": s > n * (h_units * 65536),
            }
        )

    return joined.groupBy("user_id").applyInPandasWithState(
        _fold,
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
