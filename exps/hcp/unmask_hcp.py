"""Offline unmasking of HCP-scale records into raw .npy (reference:
exps/hcp/unmask_hcp.py). Point it at a directory of 4-D volumes (or use
the synthetic fallback) and it produces the data.json manifest that
exps/hcp/decompose_hcp.py streams.
"""
import os
import sys

sys.path.insert(0, '.')

import numpy as np

from modl_tpu.input_data.fmri import create_raw_rest_data
from modl_tpu.utils.system import get_output_dir


def main(source_dir=None, n_jobs=1):
    out = os.path.join(get_output_dir(), 'unmasked', 'hcp')
    if source_dir and os.path.isdir(source_dir):
        imgs = [os.path.join(source_dir, f)
                for f in sorted(os.listdir(source_dir))
                if f.endswith('.npy')]
        mask = np.load(os.path.join(source_dir, 'mask.npy'))
    else:
        print('no source dir; generating synthetic HCP-like records')
        from modl_tpu.datasets.adhd import make_synthetic_rest_data
        imgs, mask, _ = make_synthetic_rest_data(
            n_subjects=4, n_frames=300, shape=(24, 24, 16),
            n_networks=32)
    manifest = create_raw_rest_data(imgs, mask, out, standardize=True,
                                    feature_order=0,
                                    detrend=False, n_jobs=n_jobs)
    print('manifest:', manifest)


if __name__ == '__main__':
    main(source_dir=sys.argv[1] if len(sys.argv) > 1 else None,
         n_jobs=int(sys.argv[2]) if len(sys.argv) > 2 else 1)
