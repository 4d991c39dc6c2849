"""Micro-benchmark: fixed per-pallas_call machinery on this backend.

Measures a trivial streamed-grid kernel at HCP-like operand shapes,
comparing N calls of grid G/N against one call of grid G inside a
scanned step — isolating the per-call cost (operand staging + launch +
pipeline warmup) from per-grid-step and per-byte costs. Motivates the
round-5 single-call BCD driver (docs/roofline_hcp.md round-4 table:
~0.5 ms/call at 4 calls/step).

Usage: python benchmarks/pallas_call_overhead.py
"""
import functools
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


KP, SPP, FOLD, P = 256, 1360, 8, 8      # HCP-1024 block shapes
PPB = KP // P                            # panels per block


def _kernel(G_ref, D_in, D_out, *, scale):
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _():
        D_out[:] = D_in[:]
    j0 = pid * (P * FOLD)
    blk = D_out[pl.ds(j0, P * FOLD), :]
    D_out[pl.ds(j0, P * FOLD), :] = blk * scale + 1e-6 * G_ref[:]


def make_call(n_blocks):
    """One pallas_call covering n_blocks x PPB panels (grid fused)."""
    grid = n_blocks * PPB

    def call(D8, G8):
        kern = functools.partial(_kernel, scale=0.9999)
        return pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((P * FOLD, SPP), lambda i: (i, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(D8.shape, D8.dtype),
            input_output_aliases={1: 0},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=('arbitrary',)),
        )(G8, D8)
    return call


def bench(n_calls, reps_pair=(2, 8)):
    """ms per step for a step made of ``n_calls`` pallas calls covering
    4 blocks total (4 / n_calls blocks each)."""
    blocks_per_call = 4 // n_calls
    call = make_call(blocks_per_call)
    D_full = jnp.asarray(
        np.random.RandomState(0).randn(4 * KP * FOLD // FOLD, SPP * FOLD)
        .astype(np.float32).reshape(4 * KP, FOLD * SPP))

    @functools.partial(jax.jit, static_argnames=('reps',))
    def many(D_full, reps):
        def body(i, D_full):
            parts = []
            for c in range(n_calls):
                blk = lax.dynamic_slice(
                    D_full, (c * blocks_per_call * KP, 0),
                    (blocks_per_call * KP, FOLD * SPP))
                D8 = blk.reshape(blocks_per_call * KP * FOLD, SPP)
                out = call(D8, D8 * 1.0)
                parts.append(out.reshape(blocks_per_call * KP, FOLD * SPP))
            return jnp.concatenate(parts, axis=0)
        return lax.fori_loop(0, reps, body, D_full)

    def timed(reps):
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            out = many(D_full, reps)
            # axon tunnel: block_until_ready returns early; a scalar
            # fetch is the only reliable device sync (see skills/verify)
            float(jnp.sum(out[0, :8]))
            best = min(best, time.perf_counter() - t0)
        return best

    for reps in reps_pair:
        float(jnp.sum(many(D_full, reps)[0, :8]))
    lo, hi = reps_pair
    per_step = (timed(hi) - timed(lo)) / (hi - lo)
    return per_step * 1e3


def main():
    for n_calls in (4, 2, 1):
        ms = bench(n_calls)
        print(f"{n_calls} calls/step (grid {4 // n_calls * PPB} each): "
              f"{ms:.3f} ms/step -> {ms / n_calls:.3f} ms/call")


if __name__ == '__main__':
    main()
