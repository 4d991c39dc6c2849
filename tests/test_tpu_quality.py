"""On-device quality pins for the real-TPU compute path.

The CPU suite (conftest.py forces an 8-device CPU mesh) cannot see
TPU-only numerics: XLA's DEFAULT f32 matmul precision rounds MXU inputs
to bfloat16, which in round 1 silently corrupted the 'masked'/'gram'
aggregation paths (planted-data reconstruction error 10.1 vs 1e-2; see
modl_tpu/ops/precision.py). These tests run the public estimator API in
a subprocess with a clean environment (the conftest env pins
JAX_PLATFORMS=cpu for this process) and skip unless that subprocess
lands on a real TPU backend.

Pins:
- masked/gram/full fits on planted low-rank data reconstruct to a few
  percent (the bf16 regression produced relative error ~10);
- the Pallas BCD kernel path and the pure-lax path converge to the same
  objective within 1% on l2- and l1-ball dictionary geometries (the
  kernel's in-kernel selector dots run at DEFAULT precision —
  modl_tpu/ops/bcd_pallas.py discusses why that is safe; this is the
  measurement backing it).

Set MODL_TPU_TESTS=0 to force-skip (e.g. when the chip is busy with a
benchmark run).
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, sys
sys.path.insert(0, "@REPO@")
import numpy as np
import jax

out = {'backend': jax.default_backend()}
if out['backend'] not in ('tpu',):
    print(json.dumps(out)); raise SystemExit(0)

import modl_tpu.ops.bcd_pallas as bp
from modl_tpu.decomposition.dict_fact import DictFact

rng = np.random.RandomState(0)
n, p, k = 2000, 512, 64
X = (rng.randn(n, k) @ rng.randn(k, p)).astype(np.float32)
Xnorm = float(np.sum(X ** 2))

orig = (bp.bcd_update, bp.supported, bp.max_block)

def fit(G_agg, l1_ratio, pallas):
    jax.clear_caches()
    if pallas:
        bp.bcd_update, bp.supported, bp.max_block = orig
    else:
        bp.supported = lambda *a: False
        bp.max_block = lambda *a: 0
    try:
        df = DictFact(n_components=k, reduction=2, n_epochs=3,
                      batch_size=50, code_alpha=1e-3, code_l1_ratio=0,
                      comp_l1_ratio=l1_ratio, G_agg=G_agg, Dx_agg=G_agg,
                      random_state=0, subset_sampling=sampling)
        df.fit(X)
        err = float(np.sqrt(
            np.sum((X - df.transform(X) @ df.components_) ** 2) / Xnorm))
        return err, float(df.score(X))
    finally:
        bp.bcd_update, bp.supported, bp.max_block = orig

sampling = 'auto'
# 1. aggregation-path quality (the bf16 DEFAULT-precision regression);
# fit() runs the windowed sampler (the resident-fit default)
recon = {}
for G_agg in ('masked', 'full'):
    err, _ = fit(G_agg, 0.0, pallas=True)
    recon[G_agg] = err
out['recon'] = recon

# 2. pallas-vs-lax objective parity on both ball geometries
parity = {}
for l1r in (0.0, 1.0):
    _, obj_lax = fit('masked', l1r, pallas=False)
    _, obj_pal = fit('masked', l1r, pallas=True)
    parity['l1r=%s' % l1r] = abs(obj_pal - obj_lax) / abs(obj_lax)
out['parity'] = parity

# 3. windowed-vs-gather samplers reach the same objective on-device
sampler = {}
for l1r in (0.0, 1.0):
    sampling = 'window'
    _, obj_win = fit('masked', l1r, pallas=True)
    sampling = 'gather'
    _, obj_gat = fit('masked', l1r, pallas=True)
    sampling = 'auto'
    sampler['l1r=%s' % l1r] = abs(obj_win - obj_gat) / abs(obj_gat)
out['sampler'] = sampler

# 4. segmented offload scan: trajectory equality with the resident
# 'average' path, and speedup over per-batch offloaded stepping
import time as _time
import jax.numpy as jnp
from modl_tpu.decomposition import dict_fact as _df_mod
avg_kwargs = dict(n_components=k, reduction=2, n_epochs=2,
                  batch_size=50, code_alpha=1e-3, code_l1_ratio=0,
                  Dx_agg='average', G_agg='average', random_state=0)
jax.clear_caches()
ref = DictFact(**avg_kwargs).fit(X)
jax.clear_caches()
off = DictFact(average_offload=True, **avg_kwargs).fit(X)
out['offload_max_dev'] = float(
    np.max(np.abs(off.components_ - ref.components_)))

def offload_epoch_time(seg_bytes):
    _df_mod.OFFLOAD_SEG_BYTES = seg_bytes
    df = DictFact(average_offload=True, **avg_kwargs)
    df.prepare(n_samples=n, X=X)
    Xd = df._ingest_features(jnp.asarray(X, df._dtype))
    df._partial_fit_device(Xd, None, ingested=True)  # compile + warm
    float(jnp.sum(df._state.D[0, :8]))
    t0 = _time.perf_counter()
    df._partial_fit_device(Xd, None, ingested=True)
    float(jnp.sum(df._state.D[0, :8]))
    return _time.perf_counter() - t0

seg_t = offload_epoch_time(512 * 1024 * 1024)
batch_t = offload_epoch_time(1)     # 1-batch segments ~ per-batch mode
_df_mod.OFFLOAD_SEG_BYTES = 512 * 1024 * 1024
out['offload_speedup'] = batch_t / seg_t
print(json.dumps(out))
""".replace("@REPO@", REPO)


@pytest.fixture(scope="module")
def tpu_report():
    if os.environ.get("MODL_TPU_TESTS", "1") == "0":
        pytest.skip("MODL_TPU_TESTS=0")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    try:
        res = subprocess.run([sys.executable, "-c", _CHILD], env=env,
                             capture_output=True, text=True, timeout=1500)
    except subprocess.TimeoutExpired:
        pytest.skip("TPU subprocess timed out (chip busy?)")
    lines = [l for l in res.stdout.strip().splitlines() if l.startswith("{")]
    if res.returncode != 0 or not lines:
        pytest.skip("TPU probe failed: %s" % res.stderr[-500:])
    report = json.loads(lines[-1])
    if report.get("backend") != "tpu":
        pytest.skip("no TPU backend (got %r)" % report.get("backend"))
    return report


def test_aggregation_quality_on_device(tpu_report):
    # bf16-corrupted round-1 behaviour was err ~ 10 on 'masked'
    for G_agg, err in tpu_report["recon"].items():
        assert err < 0.05, (G_agg, err)


def test_pallas_matches_lax_objective(tpu_report):
    for key, rel in tpu_report["parity"].items():
        assert rel < 1e-2, (key, rel)


def test_windowed_matches_gather_objective(tpu_report):
    for key, rel in tpu_report["sampler"].items():
        assert rel < 2e-2, (key, rel)


def test_offload_scan_matches_and_speeds_up(tpu_report):
    """The segmented offload scan must match the HBM-resident
    'average' trajectory and clearly beat per-batch stepping."""
    assert tpu_report["offload_max_dev"] <= 1e-5, \
        tpu_report["offload_max_dev"]
    assert tpu_report["offload_speedup"] >= 3.0, \
        tpu_report["offload_speedup"]
