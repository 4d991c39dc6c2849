"""Offline unmasking of rest data into raw .npy records (reference:
exps/unmask_adhd.py). Uses ADHD via nilearn when available, synthetic
rest data otherwise; output feeds the raw fMRIDictFact path directly.
"""
import os
import sys

sys.path.insert(0, '.')

import numpy as np

from modl_tpu.input_data.fmri import create_raw_rest_data
from modl_tpu.utils.system import get_output_dir


def main(n_jobs=1, feature_order=0):
    out = os.path.join(get_output_dir(), 'unmasked', 'adhd')
    try:
        # capability check BEFORE any download: NIfTI unmasking needs a
        # nilearn masker (the numpy path only handles arrays/.npy)
        import nilearn.input_data  # noqa: F401
        from modl_tpu.datasets.adhd import fetch_adhd
        dataset = fetch_adhd(n_subjects=40)
        from nilearn.input_data import MultiNiftiMasker
        masker = MultiNiftiMasker().fit(dataset['func'])
        imgs = masker.transform(dataset['func'])  # list of 2-D records
        mask = np.asanyarray(masker.mask_img_.dataobj) != 0
    except Exception as e:
        print('synthetic fallback (%s)' % e)
        from modl_tpu.datasets.adhd import make_synthetic_rest_data
        imgs, mask, _ = make_synthetic_rest_data(
            n_subjects=8, n_frames=150, shape=(16, 16, 12))
    # feature_order: store voxels pre-shuffled so the streaming fit
    # runs windowed subsets (input_data/fmri/rest.py)
    manifest = create_raw_rest_data(imgs, mask, out, standardize=True,
                                    detrend=False, n_jobs=n_jobs,
                                    feature_order=feature_order)
    print('manifest:', manifest)


if __name__ == '__main__':
    main(n_jobs=int(sys.argv[1]) if len(sys.argv) > 1 else 1)
