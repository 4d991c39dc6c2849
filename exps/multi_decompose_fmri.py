"""Reduction/learning-rate sweep for fMRI decomposition (reference:
exps/multi_decompose_fmri.py — ADHD 70-comp grid, log-and-continue on
failure).
"""
import sys

sys.path.insert(0, '.')

from joblib import Parallel, delayed

from exp_decompose_fmri import exp
from modl_tpu.utils.system import get_output_dir

REDUCTIONS = [1, 4, 8, 12]
LEARNING_RATES = [0.92]


def run_one(reduction, learning_rate):
    try:
        exp.output_dir = '%s/multi_decompose_fmri' % get_output_dir()
        run = exp.run(config_updates={'reduction': reduction,
                                      'learning_rate': learning_rate,
                                      'n_components': 70,
                                      'n_epochs': 3})
        return run.info.get('final_score')
    except Exception as e:  # reference logs and continues
        print('run r=%s lr=%s failed: %s' % (reduction, learning_rate, e))
        return None


if __name__ == '__main__':
    n_jobs = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    grid = [(r, lr) for r in REDUCTIONS for lr in LEARNING_RATES]
    results = Parallel(n_jobs=n_jobs)(
        delayed(run_one)(r, lr) for r, lr in grid)
    for (r, lr), score in zip(grid, results):
        print('reduction=%-4s lr=%-5s final=%s' % (r, lr, score))
