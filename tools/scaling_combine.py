"""Combine two scaling_leg.py JSON outputs into a BENCH.md sweep row.

Usage: python tools/scaling_combine.py <legN.json> <leg4N.json>
Asserts the determinism invariant (identical assignment hash at both
parallelism levels) before appending the row.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    lo = json.load(open(sys.argv[1]))
    hi = json.load(open(sys.argv[2]))
    assert lo["n_docs"] == hi["n_docs"], "legs ran different corpora"
    assert lo["hash"] == hi["hash"], (
        "cluster assignments differ across parallelism levels"
    )
    print(f"assignment hash identical at local[{lo['cores']}] "
          f"and local[{hi['cores']}]")
    ratio = hi["cores"] / lo["cores"]
    eff = (lo["sec"] / hi["sec"]) / ratio
    print(f"scaling efficiency ({lo['cores']}→{hi['cores']} cores): {eff:.3f}")
    stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    # annotate the efficiency cell with per-leg hypervisor steal when the
    # legs recorded it (scaling_leg.py) — a noisy window deflates the
    # wide leg and the row should say so instead of reading as a
    # regression
    steal = ""
    if lo.get("steal_frac_busy") is not None and hi.get(
        "steal_frac_busy"
    ) is not None:
        steal = (
            f" (steal {lo['steal_frac_busy']:.1%}@N"
            f" / {hi['steal_frac_busy']:.1%}@4N)"
        )
    row = (
        f"| {stamp} | {lo['n_docs']} | local[{lo['cores']}]"
        f"→local[{hi['cores']}] | {lo['docs_per_sec']:.1f} | "
        f"{hi['docs_per_sec']:.1f} | {eff:.3f}{steal} |\n"
    )
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH.md",
    )
    with open(path, "a") as f:
        f.write(row)
    print(row, end="")


if __name__ == "__main__":
    main()
