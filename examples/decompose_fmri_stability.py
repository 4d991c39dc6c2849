"""Stability-based model selection for fMRI decompositions (reference:
examples/decompose_fmri_stability.py): Amari discrepancy across seeds
over an n_components grid on rest data.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np

from modl_tpu.datasets.adhd import make_synthetic_rest_data
from modl_tpu.decomposition.fmri import fMRIDictFact
from modl_tpu.decomposition.stability import mean_amari_discrepency


def main(n_components_list=(4, 6, 8), n_runs=3):
    imgs, mask, _ = make_synthetic_rest_data(
        n_subjects=6, n_frames=80, shape=(12, 12, 8), n_networks=6)
    results = {}
    for k in n_components_list:
        dictionaries = []
        for seed in range(n_runs):
            df = fMRIDictFact(method='masked', n_components=k, reduction=3,
                              batch_size=20, n_epochs=2, alpha=1e-3,
                              mask=mask, standardize=False, detrend=False,
                              random_state=seed)
            df.fit(imgs)
            dictionaries.append(df.components_)
        mean_d, std_d = mean_amari_discrepency(dictionaries)
        results[k] = (mean_d, std_d)
        print('n_components=%-3d discrepancy %.4f +- %.4f'
              % (k, mean_d, std_d))
    best = min(results, key=lambda k: results[k][0])
    print('most stable size: %d' % best)
    return results


if __name__ == '__main__':
    argparse.ArgumentParser().parse_args()
    main()
