"""``python -m toad_tpu report`` — aggregate k-fold results.

The reference leaves per-fold rows in ``summary.csv`` for hand analysis
(``main_mtl_concat.py:64-78``); this prints/saves the cross-fold aggregate:
mean ± std (and min/max) per metric over a training results dir or an
eval-results dir, merging bootstrap CI columns and per-fold calibration
temperatures when present. One JSON line on stdout tail for scripting.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np
import pandas as pd


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TOAD-TPU k-fold result aggregation")
    p.add_argument("--dir", type=str, required=True,
                   help="results/{exp}_s{seed} (train) or eval_results/EVAL_{code} (eval)")
    p.add_argument("--out", type=str, default=None, help="write the aggregate as CSV here")
    return p


def _find_summary(d: Path) -> Path:
    cands = sorted(d.glob("summary*.csv"))
    if not cands:
        raise FileNotFoundError(f"no summary*.csv in {d} (train or eval output dir expected)")
    full = d / "summary.csv"
    return full if full.exists() else cands[0]


def aggregate(d: str | Path) -> tuple[pd.DataFrame, dict]:
    """(per-metric aggregate dataframe, flat dict for the JSON line)."""
    d = Path(d)
    df = pd.read_csv(_find_summary(d))
    metrics = [c for c in df.columns if c not in ("folds",) and not c.startswith("Unnamed")
               and pd.api.types.is_numeric_dtype(df[c])]
    rows, flat = [], {"n_folds": int(len(df)), "dir": str(d)}
    for m in metrics:
        v = df[m].to_numpy(np.float64)
        v = v[np.isfinite(v)]
        if len(v) == 0:
            continue
        rows.append({
            "metric": m,
            "mean": float(v.mean()),
            "std": float(v.std(ddof=1)) if len(v) > 1 else 0.0,
            "min": float(v.min()),
            "max": float(v.max()),
            "n": int(len(v)),
        })
        flat[f"{m}_mean"] = rows[-1]["mean"]
    # per-fold calibration temperatures, if `evaluate --calibrate` ran
    temps = []
    for f in sorted(d.glob("fold_*_calibration.json")):
        try:
            temps.append(float(json.loads(f.read_text())["temperature"]))
        except Exception:
            pass
    if temps:
        t = np.asarray(temps)
        rows.append({"metric": "calibration_temperature", "mean": float(t.mean()),
                     "std": float(t.std(ddof=1)) if len(t) > 1 else 0.0,
                     "min": float(t.min()), "max": float(t.max()), "n": len(t)})
        flat["calibration_temperature_mean"] = float(t.mean())
    return pd.DataFrame(rows), flat


def main(argv=None) -> int:
    args = make_parser().parse_args(argv)
    agg, flat = aggregate(args.dir)
    width = max(len(m) for m in agg["metric"])
    print(f"{'metric':<{width}}  {'mean':>8}  {'std':>8}  {'min':>8}  {'max':>8}  n")
    for _, r in agg.iterrows():
        print(f"{r['metric']:<{width}}  {r['mean']:>8.4f}  {r['std']:>8.4f}  "
              f"{r['min']:>8.4f}  {r['max']:>8.4f}  {int(r['n'])}")
    if args.out:
        agg.to_csv(args.out, index=False)
        print(f"wrote {args.out}")
    print(json.dumps(flat))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
