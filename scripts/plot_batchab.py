#!/usr/bin/env python
"""Figure for the round-5 global-batch LR A/B (BASELINE.md section).

Val-MAE convergence curves: batch-20 baseline vs batch-160 under three LR
scalings, 3 seeds per arm. Colors are the dataviz categorical slots 1-4 in
fixed order (the documented order passes the adjacent-pair checks in light
mode); color follows the ARM (per-seed curves share their arm's hue at
stepped alpha). Writes docs/studies/convergence/batchab/batchab_curves.png.
"""

from __future__ import annotations

import glob
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONV = os.path.join(REPO, "docs", "studies", "convergence")

ARMS = [  # (label, color = dataviz slot, glob)
    ("batch 20, LR 2e-4 (baseline)", "#2a78d6",
     os.path.join(CONV, "jax_seed*_steplr_balanced16.json")),
    ("batch 160, LR unscaled 2e-4", "#eb6834",
     os.path.join(CONV, "batchab", "jax_seed*_b160_lrbase.json")),
    ("batch 160, LR sqrt 5.7e-4", "#1baf7a",
     os.path.join(CONV, "batchab", "jax_seed*_b160_lrsqrt.json")),
    ("batch 160, LR linear 1.6e-3", "#eda100",
     os.path.join(CONV, "batchab", "jax_seed*_b160_lrlinear.json")),
]


def main() -> None:
    fig, ax = plt.subplots(figsize=(8, 4.5), dpi=150)
    fig.patch.set_facecolor("#fcfcfb")
    ax.set_facecolor("#fcfcfb")
    for label, color, pattern in ARMS:
        files = glob.glob(pattern)
        if not files:
            raise SystemExit(f"ERROR: no runs match {pattern!r} — the "
                             f"'{label}' arm would silently vanish from a "
                             "figure titled '3 seeds/arm'.")
        runs = []
        for f in files:
            with open(f) as fh:
                runs.append(json.load(fh))
        runs.sort(key=lambda r: r["seed"])
        for i, r in enumerate(runs):
            ax.plot([e for e, _ in r["val_curve"]],
                    [v for _, v in r["val_curve"]], color=color,
                    linewidth=1.4, alpha=(0.9, 0.6, 0.4)[min(i, 2)],
                    label=label if i == 0 else None)
    ax.axvline(200, color="#52514e", linewidth=0.8, linestyle=":", alpha=0.7)
    ax.text(203, 0.245, "StepLR fires (epoch 200)", fontsize=8,
            color="#52514e")
    ax.set_yscale("log")
    ax.set_xlabel("epoch", fontsize=9, color="#0b0b0b")
    ax.set_ylabel("val MAE (m, log)", fontsize=9, color="#0b0b0b")
    ax.set_title("Global-batch scaling A/B: LR must scale linearly with "
                 "the batch (3 seeds/arm)", fontsize=10, color="#0b0b0b")
    ax.grid(True, color="#e8e7e4", linewidth=0.6)
    for spine in ("top", "right"):
        ax.spines[spine].set_visible(False)
    for spine in ("left", "bottom"):
        ax.spines[spine].set_color("#c3c2b7")
    ax.tick_params(colors="#52514e", labelsize=8)
    ax.legend(frameon=False, fontsize=8, labelcolor="#0b0b0b",
              loc="upper right")
    fig.tight_layout()
    out = os.path.join(CONV, "batchab", "batchab_curves.png")
    fig.savefig(out)
    print(f"figure -> {out}")


if __name__ == "__main__":
    main()
