"""Summarize a training run's metrics.jsonl into a quantile table.

Usage: python scripts/summarize_run.py <exp_dir> [metric ...]

Reads <exp_dir>/logs/metrics.jsonl and prints, for each requested metric
(default: cosine cosine_shading psnr loss), the windowed mean at the run's
start / quartiles / end plus min/max — the one-glance evidence for "does
the CLIP term actually rise over the run" (VERDICT r2 weak #3)."""

import json
import os
import sys

import numpy as np


def summarize(exp_dir: str, metrics=None):
    path = os.path.join(exp_dir, "logs", "metrics.jsonl")
    rows = []
    with open(path) as f:
        for line in f:
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    if not rows:
        raise SystemExit(f"no rows in {path}")
    metrics = metrics or ["cosine", "cosine_shading", "psnr", "loss"]
    steps = np.array([r["step"] for r in rows])
    out = {}
    for m in metrics:
        vals = np.array([r.get(m, np.nan) for r in rows], float)
        ok = np.isfinite(vals)
        if not ok.any():
            continue
        v, s = vals[ok], steps[ok]
        n = len(v)
        w = max(1, n // 20)  # 5% windows

        def win(frac):
            c = int(frac * (n - 1))
            lo, hi = max(0, c - w // 2), min(n, c + w // 2 + 1)
            return float(np.mean(v[lo:hi]))

        out[m] = {
            "steps": [int(s[0]), int(s[-1])],
            "start": round(win(0.0), 4),
            "q25": round(win(0.25), 4),
            "q50": round(win(0.5), 4),
            "q75": round(win(0.75), 4),
            "end": round(win(1.0), 4),
            "min": round(float(v.min()), 4),
            "max": round(float(v.max()), 4),
            "n": n,
        }
    return out


if __name__ == "__main__":
    exp = sys.argv[1]
    ms = sys.argv[2:] or None
    print(json.dumps(summarize(exp, ms), indent=1))
