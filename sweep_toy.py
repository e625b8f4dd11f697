"""Energy-score hyperparameter sweep on the toy GMM (BASELINE.json config #3).

Runs the toy DDDM over a grid of (m, beta, lam) settings — default
m in {2, 8, 32} with the paper's beta/lam — measuring final toy MMD^2
(reference protocol: 4096 generated vs 4096 reference samples, RBF sigma=1,
20-step sampler) and training throughput. Writes one JSON report and prints
a table.

The reference repo has no sweep driver; this fills the benchmark
configuration "energy-score sweep: m in {2,8,32}, beta/lam variants on toy
MLP" from BASELINE.json. Each cell is a fresh jit-compiled scan-fused
training run, so a full default sweep is a few minutes on one chip.
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import time

import jax

from ddm_tpu import TrainConfig, rbf_mmd2, sample_dddm, sample_gmm, train_dddm


def run_cell(m: int, beta: float, lam: float, args) -> dict:
    cfg = TrainConfig(
        beta=beta, lam=lam, m=m, lr=args.lr, epochs=args.epochs,
        batch=args.batch, seed=args.seed, steps_per_scan=args.steps_per_scan,
        log_every=10**9,
    )
    t0 = time.perf_counter()
    state, history = train_dddm(cfg, outdir=os.path.join(args.out, f"m{m}_b{beta}_l{lam}"),
                                return_history=True)
    train_secs = time.perf_counter() - t0

    key = jax.random.PRNGKey(args.seed + 1)
    kg, kr = jax.random.split(key)
    xg = sample_dddm(state.apply_fn, state.params, kg, n_samples=4096,
                     steps=args.steps, eps_churn=args.eps_churn)
    xr = sample_gmm(kr, 4096)
    mmd2 = float(rbf_mmd2(xg, xr, sigma=1.0))
    return {
        "m": m, "beta": beta, "lam": lam,
        "mmd2_rbf_sigma1": mmd2,
        "final_confidence": history["confidence"][-1],
        "final_interaction": history["interaction"][-1],
        "steps_per_sec": args.epochs / train_secs,
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--m-values", type=int, nargs="+", default=[2, 8, 32])
    p.add_argument("--beta-values", type=float, nargs="+", default=[0.1])
    p.add_argument("--lam-values", type=float, nargs="+", default=[1.0])
    p.add_argument("--epochs", type=int, default=5000)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--eps-churn", type=float, default=0.0, dest="eps_churn")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--steps-per-scan", type=int, default=250)
    p.add_argument("--out", type=str, default="./outputs/toy_sweep")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    rows = []
    for m, beta, lam in itertools.product(args.m_values, args.beta_values,
                                          args.lam_values):
        print(f"=== m={m} beta={beta} lam={lam} ===", flush=True)
        rows.append(run_cell(m, beta, lam, args))
        r = rows[-1]
        print(f"    MMD^2={r['mmd2_rbf_sigma1']:.4f} "
              f"({r['steps_per_sec']:.0f} steps/s)", flush=True)

    with open(os.path.join(args.out, "sweep.json"), "w", encoding="utf-8") as f:
        json.dump(rows, f, indent=2)

    print(f"\n{'m':>4} {'beta':>6} {'lam':>5} {'MMD^2':>9} {'steps/s':>8}")
    for r in rows:
        print(f"{r['m']:>4} {r['beta']:>6} {r['lam']:>5} "
              f"{r['mmd2_rbf_sigma1']:>9.4f} {r['steps_per_sec']:>8.0f}")
    print(f"Wrote {os.path.join(args.out, 'sweep.json')}")


if __name__ == "__main__":
    main()
