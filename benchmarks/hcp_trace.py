"""Capture an xplane trace of the HCP-1024 (or ADHD-70) fused epoch and
print the top device ops by total duration.

The attribution layer under benchmarks/hcp_step_timing.py's slope
numbers: names the actual HLO/Mosaic ops a step spends its time in, so
optimization work targets measured costs (docs/roofline_hcp.md).

Usage: python benchmarks/hcp_trace.py [--adhd] [--epochs 2] [--top 30]
"""
import argparse
import collections
import glob
import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def capture(args, logdir):
    import jax
    import jax.numpy as jnp

    from modl_tpu import DictFact
    from modl_tpu.decomposition._step import somf_scan

    if args.adhd:
        k, reduction, batch = 70, 12, 100
        n_samples, n_features = 2000, 200_000
    else:
        k, reduction, batch = args.k, 20, 200
        n_samples, n_features = 1200, 200_000
    rng = np.random.RandomState(0)
    X = rng.randn(n_samples, n_features).astype(np.float32)
    df = DictFact(n_components=k, reduction=reduction, code_alpha=3e-4,
                  code_l1_ratio=0, comp_l1_ratio=1, learning_rate=0.92,
                  batch_size=batch, random_state=0, dtype=np.float32,
                  subset_sampling='window',
                  rand_size=bool(args.adhd))
    df.prepare(n_samples=n_samples, X=X)
    nb = n_samples // batch
    Xi = df._ingest_features(jnp.asarray(X))
    Xb = Xi.reshape(nb, batch, -1)
    ib = jnp.arange(nb * batch, dtype=jnp.int32).reshape(nb, batch)
    cfg = df._cfg

    st = somf_scan(df._state, Xb, ib, cfg)     # compile + warm
    jax.block_until_ready(st.D)
    with jax.profiler.trace(logdir):
        st = df._state
        for _ in range(args.epochs):
            st = somf_scan(st, Xb, ib, cfg)
        jax.block_until_ready(st.D)
    return nb * args.epochs


def top_ops(logdir, n_batches, top):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, '**', '*.xplane.pb'),
                      recursive=True)
    assert paths, 'no xplane capture found under %s' % logdir
    path = max(paths, key=os.path.getmtime)
    raw = open(path, 'rb').read()
    if path.endswith('.gz'):
        raw = gzip.decompress(raw)
    space = xplane_pb2.XSpace()
    space.ParseFromString(raw)

    for plane in space.planes:
        if 'TPU' not in plane.name and 'tpu' not in plane.name:
            continue
        stats = collections.defaultdict(lambda: [0, 0])   # ps, count
        total_ps = 0
        for line in plane.lines:
            lname = line.name
            if 'XLA Ops' not in lname and 'Steps' not in lname \
                    and 'Framework' not in lname and lname != 'XLA Modules':
                pass
            if lname != 'XLA Ops':
                continue
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                stats[name][0] += ev.duration_ps
                stats[name][1] += 1
                total_ps += ev.duration_ps
        if not stats:
            continue
        print('== plane %r: %.2f ms total device op time, '
              '%.3f ms/batch over %d batches' %
              (plane.name, total_ps / 1e9, total_ps / 1e9 / n_batches,
               n_batches))
        rows = sorted(stats.items(), key=lambda kv: -kv[1][0])[:top]
        for name, (ps, cnt) in rows:
            print('%9.3f ms  %8.4f ms/batch  x%-6d %s'
                  % (ps / 1e9, ps / 1e9 / n_batches, cnt, name[:110]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--adhd', action='store_true')
    ap.add_argument('--k', type=int, default=1024)
    ap.add_argument('--epochs', type=int, default=2)
    ap.add_argument('--top', type=int, default=30)
    ap.add_argument('--logdir', type=str, default='/tmp/hcp_trace')
    ap.add_argument('--parse-only', action='store_true')
    args = ap.parse_args()
    if args.adhd:
        n_samples, batch = 2000, 100
    else:
        n_samples, batch = 1200, 200
    n_batches = n_samples // batch * args.epochs
    if not args.parse_only:
        os.system('rm -rf %s' % args.logdir)
        n_batches = capture(args, args.logdir)
    top_ops(args.logdir, n_batches, args.top)


if __name__ == '__main__':
    main()
