"""Render RESULTS_raw_baseline_showdown.json as the RESULTS.md table.

Usage: python benchmarks/render_showdown.py [artifact.json]
"""

import json
import sys


def fmt(agg, key, digits=3, star=False):
    e = agg.get(key)
    if e is None:
        return "—"
    m, ci = e["mean"], e["ci95"]
    if abs(m) >= 1000 or (m != 0 and abs(m) < 10 ** (-digits)):
        return f"{m:.2e} ± {ci:.1e}"
    return f"{m:.{digits}f} ± {ci:.{digits}f}"


def rebuild_tables(d):
    """Aggregate tables from ALL ok cells (per-seed grid children leave
    1-seed tables; this re-derives every table from the full cell set)."""
    import numpy as np
    groups = {}
    for label, cell in d.get("cells", {}).items():
        if "error" in cell:
            continue
        example, method, _ = label.split("/")
        groups.setdefault(example, {}).setdefault(method, []).append(cell)
    tables = {}
    for example, methods in groups.items():
        truth = d["protocol"].get("configs", {}).get(example, {}).get(
            "logz_true")
        for method, cells in methods.items():
            keys = sorted({k for c in cells for k, v in c.items()
                           if isinstance(v, (int, float)) and k != "seed"})
            agg = {}
            for k in keys:
                vals = [c[k] for c in cells if c.get(k) is not None]
                if vals:
                    agg[k] = {"mean": float(np.mean(vals)),
                              "ci95": float(1.96 * np.std(vals)),
                              "n": len(vals)}
            if truth is not None and "log_z_is" in agg:
                agg["log_z_err"] = {
                    "mean": agg["log_z_is"]["mean"] - truth,
                    "ci95": agg["log_z_is"]["ci95"]}
            tables.setdefault(example, {})[method] = agg
    return tables


def main(path="RESULTS_raw_baseline_showdown.json"):
    with open(path) as fh:
        d = json.load(fh)
    for example, table in rebuild_tables(d).items():
        cfg = d["protocol"]["configs"].get(example, {})
        truth = cfg.get("logz_true")
        print(f"\n### {example} (dim {cfg.get('dim')}, "
              f"{cfg.get('learning_iter')} iters, "
              f"num_chain {cfg.get('num_chain')}, "
              f"logZ truth {truth if truth is None else round(truth, 3)})\n")
        print("| method | logpdf* | KSD-U | KSD-U* | MMD | logZ (IS) | "
              "IS-ESS | train s |")
        print("|---|---|---|---|---|---|---|---|")
        for method in ("mfm", "smc", "fab", "flowmc", "dds"):
            agg = table.get(method)
            if agg is None:
                continue
            n = agg.get("logpdf", {}).get("n", "?")
            print(f"| {method} (n={n}) "
                  f"| {fmt(agg, 'logpdf_star')} "
                  f"| {fmt(agg, 'stein_u', 4)} "
                  f"| {fmt(agg, 'stein_u_star', 4)} "
                  f"| {fmt(agg, 'mmd', 4)} "
                  f"| {fmt(agg, 'log_z_is', 2)} "
                  f"| {fmt(agg, 'is_ess_frac', 3)} "
                  f"| {fmt(agg, 'train_time_s', 2)} |")


if __name__ == "__main__":
    main(*sys.argv[1:])
