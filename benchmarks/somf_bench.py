"""SOMF benchmark grid: throughput across configurations.

(The reference's ``benchmarks/`` holds unrelated logistic-regression
solver timings, SURVEY 2.2; this suite benchmarks the framework itself.)
Prints one JSON line per configuration.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from modl_tpu import DictFact
from modl_tpu.decomposition._step import somf_scan
from modl_tpu.utils.profiling import sync

CONFIGS = [
    # name, n_features, k, batch, reduction, code_l1, comp_l1, alpha
    # alpha follows the reference configs: 3e-4 for fMRI-style ridge
    # codes (exps/multi_decompose_fmri.py), 0.1 for l1 image coding
    # (ImageDictFact default - weak l1 makes CD grind unrealistically)
    ("adhd70", 200_000, 70, 100, 12, 0.0, 1.0, 3e-4),
    ("adhd70_l2", 200_000, 70, 100, 12, 0.0, 0.0, 3e-4),
    ("image256", 768, 256, 200, 10, 1.0, 0.0, 0.1),
    ("hcp1024_slim", 50_000, 256, 200, 20, 0.0, 1.0, 3e-4),
]


def run_one(name, n_features, k, batch, reduction, code_l1, comp_l1,
            alpha, n_samples=2000, epochs=3, sampling='window'):
    rng = np.random.RandomState(0)
    X = rng.randn(n_samples, n_features).astype(np.float32)
    df = DictFact(n_components=k, reduction=reduction, code_alpha=alpha,
                  code_l1_ratio=code_l1, comp_l1_ratio=comp_l1,
                  learning_rate=0.92, batch_size=batch, random_state=0,
                  dtype=np.float32, subset_sampling=sampling)
    df.prepare(n_samples=n_samples, X=X)
    nb = n_samples // batch
    Xi = df._ingest_features(jnp.asarray(X[:nb * batch]))
    Xb = Xi.reshape(nb, batch, -1)
    ib = jnp.arange(nb * batch, dtype=jnp.int32).reshape(nb, batch)
    # slope timing: the same single-dispatch program at two rep counts
    # cancels every per-call constant (docs/performance.md take-away 3)
    import functools

    from jax import lax
    cfg = df._cfg

    @functools.partial(jax.jit, static_argnames=('reps',))
    def many(state, Xb, ib, reps):
        return lax.fori_loop(
            0, reps, lambda i, st: somf_scan(st, Xb, ib, cfg), state)

    lo, hi = 1, 1 + epochs
    for reps in (lo, hi):   # compile both + absorb the slow-start
        sync(many(df._state, Xb, ib, reps).D)

    def timed(reps):
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            sync(many(df._state, Xb, ib, reps).D)
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (timed(hi) - timed(lo)) / (hi - lo)
    print(json.dumps({
        "bench": name,
        "ms_per_batch": round(dt / nb * 1000, 3),
        "samples_per_s": round(nb * batch / dt, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--only', default=None)
    p.add_argument('--sampling', default='window',
                   choices=['window', 'gather'])
    a = p.parse_args()
    for cfg in CONFIGS:
        if a.only and cfg[0] != a.only:
            continue
        run_one(*cfg, sampling=a.sampling)
