#!/usr/bin/env python
"""Weight-EMA A/B on the convergence-study protocol (adopt-or-kill).

``training_settings.ema_decay`` (train/step.py) serves an exponential
moving average of the weights instead of the raw Adam iterate. This study
reruns the 300-epoch convergence-study training (scripts/convergence_study.py
— identical scene, allocation, hyperparameters, seeds, metric protocol) with
the EMA enabled and compares best-val and refined test-stripe MAE against
the stored EMA-off results (docs/CONVERGENCE.md) and the reference torch
stack's scores on the same scene.

The reference has no EMA (lib/Trainer.py trains and serves the raw
iterate), so a win here beats the reference's headline metric at identical
training cost.

Usage:
  python scripts/ema_study.py --conv-dir /root/studies/conv \
      --seeds 0 1 2 --decay 0.999 [--epochs 300]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(_HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, _HERE)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--conv-dir", default="/root/studies/conv")
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--decay", type=float, default=0.999)
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--precision", default="balanced16")
    ap.add_argument("--on-cpu", action="store_true")
    args = ap.parse_args()

    import convergence_study as cs

    decay_tag = str(args.decay).replace("0.", "")
    results = []
    for seed in args.seeds:
        tag = f"seed{seed}_steplr_{args.precision}_ema{decay_tag}"
        result = cs.run_jax(args.conv_dir, seed, args.epochs, "steplr",
                            args.precision, on_cpu=args.on_cpu, tag=tag,
                            extra_training={"ema_decay": args.decay})
        # run_jax already wrote the result file; amend the decay key in
        # place rather than re-running _write_result (double write + a
        # duplicated progress line).
        result["ema_decay"] = args.decay
        path = os.path.join(args.conv_dir, "results", f"jax_{tag}.json")
        with open(path, "w") as f:
            json.dump(result, f, indent=1)
        results.append(result)

    print(f"\nEMA A/B (decay {args.decay}, {args.epochs} epochs, "
          f"{args.precision}):")
    print(f"{'seed':>5s} {'best_val(ema)':>14s} {'best_val(off)':>14s} "
          f"{'test(ema)':>10s} {'test(off)':>10s} {'test(torch)':>12s}")
    for seed, result in zip(args.seeds, results):
        def stored(name):
            path = os.path.join(args.conv_dir, "results", name)
            return json.load(open(path)) if os.path.exists(path) else None
        off = stored(f"jax_seed{seed}_steplr_{args.precision}.json")
        torch = stored(f"torch_seed{seed}_steplr.json")
        print(f"{seed:5d} {result['best_val_mae']:14.4f} "
              f"{(off or {}).get('best_val_mae', float('nan')):14.4f} "
              f"{result['refined_test_mae']:10.4f} "
              f"{(off or {}).get('refined_test_mae', float('nan')):10.4f} "
              f"{(torch or {}).get('refined_test_mae', float('nan')):12.4f}")


if __name__ == "__main__":
    main()
