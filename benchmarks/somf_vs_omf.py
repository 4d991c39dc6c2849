"""SOMF-vs-OMF time-to-objective: the reference's headline claim, on TPU.

The reference README's central performance claim
(/root/reference/README.md:10, backed by the compare.jpg figure and the
TSP'18 paper) is that stochastic subsampling (SOMF, reduction r > 1)
reaches the same objective "an order of magnitude faster" than plain
online matrix factorization (OMF, r = 1) on large datasets. This
benchmark reproduces that comparison inside this framework on the
flagship ADHD-shaped config: identical data, identical estimator, only
``reduction`` varies.

Protocol (mirrors the reference scorer contract, fmri.py:588-633:
test-objective evaluation time is excluded from the reported clock):
fused-scan epochs are timed with a scalar sync; after each epoch the
penalised objective (``DictFact.score``) is evaluated on a held-out
set. The figure of merit is wall-clock to reach the objective that the
OMF run attains at its final epoch, interpolated within epochs.

Prints one JSON line per reduction plus a summary line with the
speedup table. Run on the TPU (no env vars); ~5 min.
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

N_SAMPLES = 2000
N_TEST = 500
N_FEATURES = 200_000
K = 70
BATCH = 100
ALPHA = 3e-4
LR = 0.92
REDUCTIONS = (1, 4, 12, 24)
EPOCHS = {1: 8, 4: 12, 12: 20, 24: 30}    # cheap epochs -> more of them


def _planted(n, n_features, seed):
    """Train and held-out rows drawn from ONE planted dictionary (a
    shared V — a per-split V would give the test objective nothing to
    converge to)."""
    rng = np.random.RandomState(seed)
    U = rng.randn(n, K).astype(np.float32)
    V = rng.randn(K, n_features).astype(np.float32) / 30
    return U @ V + 0.1 * rng.randn(n, n_features).astype(np.float32)


def _planted_device(n_train, n_test, n_features, seed):
    """Same planted model generated on-device (jax.random): at the
    larger scales the claim calls for (reference README.md:10 shows it
    on HCP-scale data) host generation + the tunneled H2D transfer of
    a multi-GB matrix would dominate the benchmark's wall clock.
    Train and test are drawn as separate splits of ONE planted V so
    the peak HBM residency is one copy of each, not a concatenation."""
    def gen(key, n, kv):
        ku, ke = jax.random.split(key, 2)
        U = jax.random.normal(ku, (n, K), jnp.float32)
        V = jax.random.normal(kv, (K, n_features), jnp.float32) / 30
        return U @ V + 0.1 * jax.random.normal(ke, (n, n_features),
                                               jnp.float32)
    k_train, k_test, kv = jax.random.split(jax.random.PRNGKey(seed), 3)
    return (jax.jit(gen, static_argnums=1)(k_train, n_train, kv),
            jax.jit(gen, static_argnums=1)(k_test, n_test, kv))


def run_one(reduction, X, X_test_dev, dict_init, epochs):
    from modl_tpu.decomposition._step import objective_value

    n_samples = int(X.shape[0])
    # random dictionary init: initializing from data rows (the default)
    # makes this planted problem converge inside the first epoch for
    # every reduction, leaving nothing to compare — the learning curve
    # is only visible when the dictionary has to be learned
    df = DictFact(n_components=K, reduction=reduction, code_alpha=ALPHA,
                  code_l1_ratio=0, comp_l1_ratio=1, learning_rate=LR,
                  batch_size=BATCH, random_state=0, dtype=np.float32,
                  subset_sampling='window', dict_init=dict_init)
    df.prepare(n_samples=n_samples, X=dict_init)
    assert n_samples % BATCH == 0, (
        "--n-samples must be a multiple of the batch size %d (got %d); "
        "refusing to silently drop the tail rows" % (BATCH, n_samples))
    nb = n_samples // BATCH
    # one expression so the ingested intermediate (train + mirror pad)
    # is freed as soon as the batched view exists — at multi-GB train
    # sets keeping both alive for the whole fit wastes ~HBM train size
    Xb = df._ingest_features(
        jnp.asarray(X, df._state.D.dtype)).reshape(nb, BATCH, -1)
    ib = jnp.arange(nb * BATCH, dtype=jnp.int32).reshape(nb, BATCH)

    def score():
        # device-resident test objective (DictFact.score would round-trip
        # the 400 MB test set through host numpy on every call — minutes
        # over a tunneled link)
        D = df._components_device()
        return float(objective_value(
            D, None, X_test_dev, float(df.code_l1_ratio),
            float(df.code_alpha), bool(df.code_pos), float(df.tol),
            int(df.max_iter), solver=df._code_solver()))

    # warm the jit caches (epoch scan + scorer) outside the clock
    st = somf_scan(df._state, Xb, ib, df._cfg)
    float(jnp.sum(st.D[0, :8]))
    score()

    traj = []
    train_t = 0.0
    for _ in range(epochs):
        t0 = time.perf_counter()
        df._state = somf_scan(df._state, Xb, ib, df._cfg)
        float(jnp.sum(df._state.D[0, :8]))       # scalar sync
        train_t += time.perf_counter() - t0
        traj.append((train_t, score()))          # excluded from clock
    return traj


def time_to(traj, target):
    """First wall-clock at which the trajectory reaches ``target``
    (linear interpolation within the epoch that crosses it)."""
    prev_t, prev_o = 0.0, float('inf')
    for t, o in traj:
        if o <= target:
            if prev_o == float('inf') or prev_o == o:
                return t
            frac = (prev_o - target) / (prev_o - o)
            return prev_t + frac * (t - prev_t)
        prev_t, prev_o = t, o
    return None


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--reductions', type=int, nargs='*',
                   default=list(REDUCTIONS))
    p.add_argument('--n-samples', type=int, default=N_SAMPLES,
                   help='planted training rows (the claim grows with '
                        'data size — reference README.md:10 shows it '
                        'on HCP-scale data)')
    p.add_argument('--epoch-scale', type=float, default=1.0,
                   help='multiply the per-reduction epoch budgets')
    p.add_argument('--host-data', action='store_true',
                   help='generate the planted set with host numpy '
                        '(round-3-comparable seeds) instead of '
                        'on-device jax.random')
    p.add_argument('--seed', type=int, default=0,
                   help='planted-data seed (the headline is sensitive '
                        'to where the OMF target lands relative to '
                        'SOMF\'s plateau — sweep seeds to check '
                        'robustness)')
    args = p.parse_args()
    n_samples = args.n_samples
    if n_samples % BATCH:
        n_samples -= n_samples % BATCH
        print('n-samples rounded down to %d (a multiple of the batch '
              'size %d)' % (n_samples, BATCH))

    if args.host_data:
        Xall = _planted(n_samples + N_TEST, N_FEATURES, seed=args.seed)
        X, X_test_dev = Xall[:n_samples], jnp.asarray(Xall[n_samples:])
    else:
        X, X_test_dev = _planted_device(n_samples, N_TEST, N_FEATURES,
                                        seed=args.seed)
    dict_init = np.random.RandomState(42).randn(
        K, N_FEATURES).astype(np.float32)

    trajs = {}
    for r in args.reductions:
        epochs = max(1, int(round(EPOCHS.get(r, 12) * args.epoch_scale)))
        trajs[r] = run_one(r, X, X_test_dev, dict_init, epochs)
        print(json.dumps({"reduction": r,
                          "trajectory": [(round(t, 3), round(o, 5))
                                         for t, o in trajs[r]]}),
              flush=True)

    if 1 in trajs:
        # headline target: the worst final objective across runs — every
        # run reaches it, so each time-to-target is well-defined
        target = max(traj[-1][1] for traj in trajs.values())
        t_omf = time_to(trajs[1], target)
        speedups = {}
        for r, traj in trajs.items():
            tt = time_to(traj, target)
            speedups[r] = round(t_omf / tt, 2) if tt else None
        # sweep: speedup at the objective OMF attains after each of its
        # epochs (convergence-depth-dependent — the looser the target,
        # the larger SOMF's advantage, exactly the compare.jpg shape)
        sweep = []
        for t_o, obj in trajs[1]:
            rows = {r: time_to(traj, obj) for r, traj in trajs.items()}
            sweep.append({"target": round(obj, 4),
                          "omf_s": round(t_o, 3),
                          "speedup": {r: (round(t_o / tt, 2) if tt else
                                          None)
                                      for r, tt in rows.items()}})
        print(json.dumps({"metric": "somf_vs_omf_speedup",
                          "target_objective": round(target, 5),
                          "omf_time_s": round(t_omf, 3) if t_omf else None,
                          "speedup_vs_omf": speedups,
                          "per_omf_epoch": sweep}), flush=True)


if __name__ == '__main__':
    main()
