"""Summarize a completed run_full_matrix.py sitting into a PARITY-ready
table: per-arm wall times, model-dir counts, artifact-tree checks, and
the per-training distribution. Reads only (safe to run mid-flight for a
progress snapshot).

Usage: python benchmarks/summarize_full_matrix.py [workdir]
"""

import json
import os
import sys

import pandas as pd

WORKDIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "BISCUIT_MATRIX_DIR", "/tmp/biscuit_full_matrix")


def main():
    report_path = os.path.join(WORKDIR, "matrix_report.json")
    with open(report_path) as f:
        report = json.load(f)
    print("== per-arm ==")
    tot_wall = tot_models = 0.0
    for arm, r in report.get("arms", {}).items():
        n = r.get("new_model_dirs", 0)
        w = r.get("wall_s", 0.0)
        tot_wall += w
        tot_models += n
        rate = (w / n) if n else float("nan")
        print(f"{arm:9s} {r.get('experiments', '?'):4} exps  "
              f"{n:5d} model dirs  {w:8.1f} s  ({rate:.2f} s/training)")
    print(f"{'TOTAL':9s} {report.get('n_experiments', '?'):4} exps  "
          f"{int(tot_models):5d} model dirs  {tot_wall:8.1f} s "
          f"(+ results {report.get('results_wall_s', '?')} s)")

    models_dir = os.path.join(WORKDIR, "training", "models")
    n_dirs = len(os.listdir(models_dir)) if os.path.isdir(models_dir) else 0
    print(f"model dirs on disk: {n_dirs}")

    results = os.path.join(WORKDIR, "results")
    for f in ("crossval_results.csv", "ratio_results.csv", "gan_results.csv"):
        p = os.path.join(results, f)
        if os.path.exists(p):
            df = pd.read_csv(p)
            print(f"{f}: {len(df)} rows")
    svgs = sorted(f for f in os.listdir(results)
                  if f.endswith(".svg")) if os.path.isdir(results) else []
    print(f"figures: {len(svgs)} svg ({', '.join(svgs)})")

    evals_dir = os.path.join(WORKDIR, "evaluation", "eval")
    n_evals = len(os.listdir(evals_dir)) if os.path.isdir(evals_dir) else 0
    print(f"eval dirs: {n_evals}")


if __name__ == "__main__":
    main()
