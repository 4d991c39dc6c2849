"""A/B the deferred-B segment-end pass formulations at HCP-1024 shapes.

The round-5 xplane trace attributes ~14.8 ms to the segment-end
``B = pi * B0 + SC.T @ Xseg`` (GEMM 4.4 + layout copies ~10.4) at
k=1024, n=200k, T*b=1200. This harness times candidate formulations of
the same math in isolation (slope-timed, two rep counts, like
bench.py) to find which layout avoids the copies:

  a) sc_t:    pi*B0 + SC.T @ Xseg        (shipping form; SC (Tb, k))
  b) sct:     pi*B0 + SCt @ Xseg         (SCt carried (k, Tb))
  c) einsum:  pi*B0 + einsum('tbk,tbn->kn', SCb, Xb)  (no reshape)
  d) addmm:   lax.dot_general into B0 with preferred_element_type and
              the EMA folded via scaling SCt by 1 (same as b, kept for
              output-layout comparison)
"""
import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp


def timed(fn, args, reps_lo=2, reps_hi=6):
    def run(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        return time.perf_counter() - t0

    jax.block_until_ready(fn(*args))  # compile
    run(1)
    return (run(reps_hi) - run(reps_lo)) / (reps_hi - reps_lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--k', type=int, default=1024)
    ap.add_argument('--n', type=int, default=200_000)
    ap.add_argument('--t', type=int, default=6)
    ap.add_argument('--b', type=int, default=200)
    args = ap.parse_args()
    k, n, T, b = args.k, args.n, args.t, args.b

    rng = np.random.RandomState(0)
    Xb = jnp.asarray(rng.randn(T, b, n).astype(np.float32))
    B0 = jnp.asarray(rng.randn(k, n).astype(np.float32))
    SCb = jnp.asarray(rng.randn(T, b, k).astype(np.float32) * 1e-3)
    SC = SCb.reshape(T * b, k)
    SCt = jnp.asarray(np.ascontiguousarray(np.asarray(SC).T))
    Xseg = Xb.reshape(T * b, n)
    pi = jnp.float32(0.5)

    @jax.jit
    def f_sc_t(B0, SC, Xseg, pi):
        return pi * B0 + SC.T @ Xseg

    @jax.jit
    def f_sct(B0, SCt, Xseg, pi):
        return pi * B0 + SCt @ Xseg

    @jax.jit
    def f_einsum(B0, SCb, Xb, pi):
        return pi * B0 + jnp.einsum('tbk,tbn->kn', SCb, Xb)

    @jax.jit
    def f_sct_3d(B0, SCt, Xb, pi):
        # contract over a single flattened axis but keep X 3-D:
        # dot_general with two contracting dims on X's (t, b)
        SCr = SCt.reshape(SCt.shape[0], Xb.shape[0], Xb.shape[1])
        return pi * B0 + jax.lax.dot_general(
            SCr, Xb, (((1, 2), (0, 1)), ((), ())))

    for name, fn, a in [
            ('sc_t   (ship)', f_sc_t, (B0, SC, Xseg, pi)),
            ('sct    (k,Tb)', f_sct, (B0, SCt, Xseg, pi)),
            ('einsum  3d   ', f_einsum, (B0, SCb, Xb, pi)),
            ('sct_3d  dotg ', f_sct_3d, (B0, SCt, Xb, pi)),
    ]:
        dt = timed(fn, a)
        print(f"{name}: {dt * 1e3:7.2f} ms")


if __name__ == '__main__':
    main()
