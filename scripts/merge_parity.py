"""Merge parity.json fragments (reference-only / ours-only runs) into
one artifact + markdown table.  Fragments must share config (reps,
budget, seeds) — asserted on the fields that pin the matched worlds.

Usage: python scripts/merge_parity.py OUT_DIR FRAGMENT_DIR [...]
"""

import json
import os
import sys


def main():
    out_dir, frags = sys.argv[1], sys.argv[2:]
    merged = None
    for d in frags:
        with open(os.path.join(d, "parity.json")) as f:
            part = json.load(f)
        if merged is None:
            merged = part
            continue
        for k in ("reps", "budget", "sims", "adaptive"):
            assert merged["config"][k] == part["config"][k], (
                f"config mismatch on {k}: {merged['config'][k]} != {part['config'][k]}"
            )
        merged["config"].update(
            {k: v for k, v in part["config"].items() if k not in merged["config"]}
        )
        for planner, entry in part["planners"].items():
            merged["planners"].setdefault(planner, {}).update(entry)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "parity.json"), "w") as f:
        json.dump(merged, f, indent=1)

    cfgm = merged["config"]
    lines = [
        "# Solution-quality parity vs the reference implementations",
        "",
        f"Matched worlds (reference GRF ground truths, seed 1234), budget "
        f"{cfgm['budget']}, {cfgm['reps']} repetitions, "
        f"{'adaptive' if cfgm.get('adaptive') else 'non-adaptive'}, "
        f"{cfgm['sims']} MCTS simulations. Mean ± std.",
        "",
        "| planner | impl | tr(P) @50% | tr(P) final | RMSE @50% | RMSE final |",
        "|---|---|---|---|---|---|",
    ]
    for planner, entry in merged["planners"].items():
        for impl in ("reference", "ours"):
            if impl not in entry:
                continue
            e = entry[impl]
            lines.append(
                f"| {planner} | {impl} | "
                f"{e['uncertainty_mid'][0]:.2f}±{e['uncertainty_mid'][1]:.2f} | "
                f"{e['uncertainty_final'][0]:.2f}±{e['uncertainty_final'][1]:.2f} | "
                f"{e['rmse_mid'][0]:.3f}±{e['rmse_mid'][1]:.3f} | "
                f"{e['rmse_final'][0]:.3f}±{e['rmse_final'][1]:.3f} |"
            )
    with open(os.path.join(out_dir, "parity.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
