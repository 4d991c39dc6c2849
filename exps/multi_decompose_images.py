"""Reduction-grid sweep for image decomposition (reference:
exps/multi_decompose_images.py — reduction grid x methods with 3
retries per run, joblib fan-out).
"""
import sys

sys.path.insert(0, '.')

from joblib import Parallel, delayed

from exp_decompose_images import exp
from modl_tpu.utils.system import get_output_dir

REDUCTIONS = [1, 4, 6, 8, 12, 24]
METHODS = ['masked', 'gram']


def run_one(method, reduction):
    for attempt in range(3):  # reference retries a failed run 3x
        try:
            exp.output_dir = '%s/multi_decompose_images' % get_output_dir()
            run = exp.run(config_updates={'method': method,
                                          'reduction': reduction,
                                          'n_epochs': 2,
                                          'n_components': 64})
            return run.info.get('final_score')
        except Exception as e:
            print('run %s/r=%s attempt %d failed: %s'
                  % (method, reduction, attempt + 1, e))
    return None


if __name__ == '__main__':
    n_jobs = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    results = Parallel(n_jobs=n_jobs)(
        delayed(run_one)(m, r) for m in METHODS for r in REDUCTIONS)
    for (m, r), score in zip(((m, r) for m in METHODS for r in REDUCTIONS),
                             results):
        print('%-8s reduction=%-4s final=%s' % (m, r, score))
