"""Regenerate PERF.md's "Complete Spark-vs-DuckDB table" from the two
machine-readable records (VERDICT r9 item 3: one current table, every cell
traceable to the round's own runs):

  - Spark numerators: BENCH_local.json (bench.py's full closing record)
  - DuckDB denominators: the JSON line emitted by tools/oracle_times.py

Usage: python tools/ratio_table.py BENCH_local.json oracle_times.json
Prints the markdown table (paste into PERF.md) plus geomean/median/win
counts over the comparable rows.
"""

from __future__ import annotations

import json
import math
import re
import sys


def main() -> None:
    bench = json.load(open(sys.argv[1]))
    orc = json.load(open(sys.argv[2]))
    spark_times = bench["queries"]
    duck = orc["times"]
    # extract the timeout cap with a real prefix match; fail loudly on an
    # unexpected protocol string instead of dividing by 0 (ADVICE r10)
    m = re.search(r"timeout_(\d+(?:\.\d+)?)s", orc["protocol"])
    if not m:
        raise SystemExit(
            f"cannot parse timeout cap from protocol {orc['protocol']!r}"
        )
    cap = float(m.group(1))

    rows = []
    ratios = []
    wins = 0
    for name, s in spark_times.items():
        if name not in duck:
            continue
        d = duck[name]
        if isinstance(d, str):  # ">60s" interrupted
            dv = cap  # lower bound on the oracle's cost -> ratio is an upper bound
            ratio = s / dv
            # the cap is a LOWER bound on the oracle's cost, so the ratio is
            # an UPPER bound either side of 1 — always render the '<' marker
            rtxt = f"**<{ratio:.2f}x**" if ratio < 1 else f"<{ratio:.1f}x"
            rows.append((name, s, d + " (interrupted)", rtxt))
        else:
            ratio = s / d if d > 0 else float("inf")
            rtxt = f"**{ratio:.2f}x**" if ratio <= 1 else f"{ratio:.1f}x"
            rows.append((name, s, f"{d:.3f}", rtxt))
        ratios.append(ratio)
        if ratio <= 1:
            wins += 1

    print("| query | Spark s | DuckDB 32T s | ratio |")
    print("|---|---|---|---|")
    for name, s, d, r in rows:
        print(f"| {name} | {s:.2f} | {d} | {r} |")
    gm = math.exp(sum(math.log(max(r, 1e-9)) for r in ratios) / len(ratios))
    med = sorted(ratios)[len(ratios) // 2]
    le2 = sum(1 for r in ratios if r <= 2)
    print(
        f"\n{len(rows)} comparable rows: geomean {gm:.2f}x, median {med:.2f}x, "
        f"{le2} rows <=2x, {wins} outright Spark wins (<=1x)."
    )


if __name__ == "__main__":
    main()
