"""Pallas TPU kernel for the in-place EMA-GEMM ``B = pi * B + SC.T @ X``.

The deferred-B segmentation (`_step.py::somf_scan`, reference
modl/dict_fact.py:567-575's B EMA reordered over a segment) ends with
one full-width materialisation ``B = pi * B0 + SC.T @ Xseg`` over the
(k, n_stored) surrogate gradient. Left to XLA at HCP-1024 shapes
(k=1024, n_stored=210k, T*b=1200) this costs ~12 ms/epoch on a v5e:
the GEMM picks a column-major output layout, forcing two full-width
layout copies (~5.2 ms) on the scan-carried B, and X is re-converted
to bf16 every epoch (~2.3 ms) because the convert cannot be hoisted
across the jit boundary.

This kernel streams column tiles of B (input/output-aliased: the
update is in place, no layout change, no defensive copy) and X through
VMEM with SC.T resident, and fuses the decay, the MXU contraction,
and the accumulate into one pass: HBM sees one read of X, one read +
one write of B, nothing else.

MEASURED RESULT — NET LOSS, OFF BY DEFAULT (``ENABLED = False``).
The round-5 on-device A/B at HCP-1024 (benchmarks/hcp_step_timing.py,
persistent-cache, 2 runs per leg): baseline XLA dot 7.22/7.28/7.32
ms/batch vs kernel 7.69/7.76 ('arbitrary' grid) and 7.63 ('parallel'
grid) — the kernel costs ~0.4 ms/batch MORE end to end. Why the
trace-derived hypothesis (~12 ms/epoch of XLA layout copies +
re-converts around the dot) did not convert: the kernel's (m, NT) /
(k, NT) column tiles of the row-major X and B are 1 KB-strided DMAs
(m resp. k separate segments per tile), while XLA's one-time layout
copy turns its GEMM streams contiguous — at this aspect ratio the
copy amortizes better than the strided stream. Kept as an opt-in
(flip ``ENABLED``; benchmarks/hcp_step_timing.py --emagemm) so the
A/B stays reproducible on other topologies.

Precision: the in-kernel dot pins ``lax.Precision.DEFAULT``
(single-pass bf16) — Mosaic has no lowering for the 3-pass HIGH the
surrounding ``ops.precision`` context would request, and HIGHEST is
~6x (see the identical pin in ``ops/bcd_pallas.py``). The bf16 input
rounding enters B once per segment and is decayed by the EMA like any
other per-segment contribution; objective-trajectory parity vs the
exact lax path is pinned on-device by tests/test_tpu_quality, and the
f64 serial oracles (tests/test_reference_parity.py) are untouched —
``supported`` refuses non-f32 dtypes so the oracle path never routes
here.
"""
import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# flipped to True by tests to run the kernel in interpreter mode on CPU
INTERPRET = False

# measured net loss at HCP-1024 vs the XLA dot (see module docstring):
# off unless explicitly enabled for an A/B
ENABLED = False

# column-tile width: X tile (m, NT) + B in/out tiles (k, NT) double
# buffered + resident SC.T must fit VMEM (~16 MB on v5e)
NT = 256

# VMEM budget for resident SC.T + the pipeline buffers (bytes)
VMEM_BUDGET = 13 * 1024 * 1024


def supported(k, n, m, dtype):
    """Whether the kernel covers this (B (k, n), SC (m, k)) shape.

    Always False while ``ENABLED`` is off (measured net loss at HCP
    shapes — module docstring)."""
    if not ENABLED:
        return False
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if k % 8 != 0 or m % 8 != 0:
        return False
    resident = 4 * k * m                    # SC.T
    pipeline = 4 * NT * (2 * m + 4 * k)     # X in x2, B in x2 + out x2
    return resident + pipeline <= VMEM_BUDGET


def _kernel(pi_ref, sct_ref, x_ref, b_ref, out_ref):
    out_ref[:] = pi_ref[0, 0] * b_ref[:] + jnp.dot(
        sct_ref[:], x_ref[:], preferred_element_type=jnp.float32,
        precision=lax.Precision.DEFAULT)


@jax.jit
def ema_accumulate(B, SC, X, pi):
    """``pi * B + SC.T @ X`` with B updated in place (aliased).

    B (k, n) f32, SC (m, k) f32, X (m, n) f32, pi scalar. The caller
    gates on :func:`supported`.
    """
    k, n = B.shape
    m = SC.shape[0]
    sct = SC.T                               # (k, m), one small transpose
    pi2 = jnp.reshape(jnp.asarray(pi, jnp.float32), (1, 1))
    grid = (pl.cdiv(n, NT),)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),        # SC.T resident
            pl.BlockSpec((m, NT), lambda i: (0, i)),      # X tile
            pl.BlockSpec((k, NT), lambda i: (0, i)),      # B tile (alias)
        ],
        out_specs=pl.BlockSpec((k, NT), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((k, n), jnp.float32),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel',)),
        interpret=INTERPRET,
    )(pi2, sct, X, B)
