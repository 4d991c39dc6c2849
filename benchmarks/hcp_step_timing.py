"""HCP-1024 step timing harness (slope-based, dispatch-free).

Measures seconds/batch of the fused SOMF epoch scan at the reference's
HCP configuration (exps/hcp/decompose_hcp.py:51-63: k=1024, n=2e5,
reduction 20, batch 200, l1 dictionary ball) on the current backend.
Used for on-device A/Bs of dictionary-update changes; bench.py carries
the official number.

Usage: python benchmarks/hcp_step_timing.py [--steps-hi 6] [--ablate X]
"""
import argparse
import functools
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--lo', type=int, default=1)
    ap.add_argument('--hi', type=int, default=6)
    ap.add_argument('--k', type=int, default=1024)
    ap.add_argument('--adhd', action='store_true',
                    help='ADHD-70 preset (k=70, reduction 12, batch 100,'
                         ' Binomial subset sizes — bench.py flagship)')
    ap.add_argument('--newton', type=int, default=None)
    ap.add_argument('--ablate', type=str, default='')
    ap.add_argument('--foldoff', action='store_true')
    ap.add_argument('--dablate', type=str, default='',
                    help='driver-stage ablations: gather,gemm,scatter')
    ap.add_argument('--driver', type=str, default='',
                    choices=['', 'gathered', 'prepermuted'],
                    help='block-driver layout A/B (_step._DRIVER_MODE)')
    ap.add_argument('--emagemm', action='store_true',
                    help='enable the segment-end EMA-GEMM Pallas kernel '
                         '(ops/ema_gemm.py; off by default — measured '
                         'net loss, see its module docstring) for A/Bs')
    ap.add_argument('--n-samples', type=int, default=None,
                    help='stream length per fused scan (default: 1200 '
                         'HCP / 2000 ADHD). Longer streams lengthen the '
                         'deferred-B segment (_step._deferred_seg caps '
                         'it at 2n/3s, 16): the full-width B pass and '
                         'its layout copies amortise over more batches')
    ap.add_argument('--seg', type=int, default=None,
                    help='deferred-B segment length override '
                         '(_step._SEG_OVERRIDE); exact math at any '
                         'value — a pure summation reorder')
    ap.add_argument('--stub', type=str, default='',
                    choices=['', 'dict', 'kernel', 'affine'],
                    help="perf attribution (breaks exactness): 'dict' "
                         "skips the dictionary update entirely, "
                         "'kernel' keeps the block driver but makes "
                         "the BCD kernel an identity")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from modl_tpu.ops import bcd_pallas, ema_gemm
    if args.emagemm:
        ema_gemm.ENABLED = True
    if args.newton is not None:
        bcd_pallas.NEWTON_ITERS = args.newton
    if args.ablate:
        bcd_pallas._ABLATE = frozenset(args.ablate.split(','))
    if args.foldoff:
        bcd_pallas.FOLD_MIN_S = 1 << 60   # fold=1: no sublane relayout

    from modl_tpu import DictFact
    import modl_tpu.decomposition._step as _step
    from modl_tpu.decomposition._step import somf_scan

    if args.dablate:
        _step._DRIVER_ABLATE = frozenset(args.dablate.split(','))
    if args.seg is not None:
        _step._SEG_OVERRIDE = args.seg
    if args.driver:
        _step._DRIVER_MODE = args.driver
    if args.stub == 'dict':
        _step._update_dict = (
            lambda D, G, comp_norm, C, grad_subset, subset, w, order,
            cfg, n_features, n_valid=None: (D, G, comp_norm))
    elif args.stub == 'kernel':
        _step._bcd_kernel_call = (
            lambda cfg, D_blk, grad_blk, C_inner, cn, order:
            (D_blk, cn))
    elif args.stub == 'affine':
        # cheap but non-trivial XLA-native stand-in: discriminates
        # pallas-call machinery cost from the surrounding driver
        _step._bcd_kernel_call = (
            lambda cfg, D_blk, grad_blk, C_inner, cn, order:
            (D_blk * 0.999 + 1e-6 * grad_blk, cn + 1.0))

    if args.adhd:                          # rand_size default (Binomial)
        args.k, reduction, batch = 70, 12, 100
        n_samples, n_features = 2000, 200_000
    else:
        reduction, batch = 20, 200
        n_samples, n_features = 1200, 200_000
    if args.n_samples is not None:
        n_samples = args.n_samples
        assert n_samples % batch == 0, "n-samples must be a batch multiple"
    rng = np.random.RandomState(0)
    X = rng.randn(n_samples, n_features).astype(np.float32)
    df = DictFact(n_components=args.k, reduction=reduction,
                  code_alpha=3e-4, code_l1_ratio=0, comp_l1_ratio=1,
                  learning_rate=0.92, batch_size=batch, random_state=0,
                  dtype=np.float32, subset_sampling='window')
    df.prepare(n_samples=n_samples, X=X)
    nb = n_samples // batch
    Xi = df._ingest_features(jnp.asarray(X))
    Xb = Xi.reshape(nb, batch, -1)
    ib = jnp.arange(nb * batch, dtype=jnp.int32).reshape(nb, batch)
    cfg = df._cfg

    @functools.partial(jax.jit, static_argnames=('reps',))
    def many(state, Xb, ib, reps):
        def body(i, st):
            return somf_scan(st, Xb, ib, cfg)
        return lax.fori_loop(0, reps, body, state)

    def timed(reps):
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            st = many(df._state, Xb, ib, reps)
            float(jnp.sum(st.D[0, :8]) + st.n_iter)
            best = min(best, time.perf_counter() - t0)
        return best

    for reps in (args.lo, args.hi):
        st = many(df._state, Xb, ib, reps)
        float(jnp.sum(st.D[0, :8]) + st.n_iter)
    per_epoch = (timed(args.hi) - timed(args.lo)) / (args.hi - args.lo)
    ms_batch = per_epoch / nb * 1e3
    print(f"k={args.k} n={n_samples} "
          f"seg={_step._deferred_seg(cfg, nb)} "
          f"newton={args.newton or bcd_pallas.NEWTON_ITERS} "
          f"ablate={sorted(bcd_pallas._ABLATE)} stub={args.stub!r} "
          f"dablate={sorted(_step._DRIVER_ABLATE)} "
          f"driver={_step._DRIVER_MODE} fold={'off' if args.foldoff else 'on'}: "
          f"{ms_batch:.2f} ms/batch, "
          f"{n_samples / per_epoch:.0f} samples/s")


if __name__ == '__main__':
    main()
