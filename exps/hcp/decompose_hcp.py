"""HCP-scale decomposition (reference: exps/hcp/decompose_hcp.py —
1024 components, reduction 20, batch 200, lr 0.92 on 2 TB of raw
records).

The raw pipeline contract: records pre-unmasked to .npy by
exps/unmask_adhd.py / create_raw_rest_data, streamed through
fMRIDictFact with the MultiRawMasker fast path. On a TPU chip the
compute step is device-bound; host IO overlaps via the io/cpu split.
"""
import os
import sys

sys.path.insert(0, '.')

from modl_tpu.decomposition.fmri import fMRIDictFact
from modl_tpu.input_data.fmri import get_raw_rest_data
from modl_tpu.utils.system import get_output_dir


def main(records_dir=None, n_components=1024, reduction=20, batch_size=200,
         learning_rate=0.92, alpha=1e-4, n_epochs=1):
    records_dir = records_dir or os.path.join(get_output_dir(),
                                              'unmasked', 'hcp')
    if not os.path.exists(os.path.join(records_dir, 'data.json')):
        print('no raw records under %s - run the unmask pipeline first '
              '(exps/unmask_adhd.py for the toy version)' % records_dir)
        return None
    masker, records = get_raw_rest_data(records_dir)
    dict_fact = fMRIDictFact(method='masked',
                             n_components=n_components,
                             reduction=reduction,
                             batch_size=batch_size,
                             learning_rate=learning_rate,
                             alpha=alpha,
                             n_epochs=n_epochs,
                             mask=masker.mask_img_,
                             standardize=False, detrend=False,
                             random_state=0, verbose=20)
    dict_fact.fit(records)
    out = os.path.join(get_output_dir(), 'hcp_components.npy')
    import numpy as np
    np.save(out, dict_fact.components_)
    print('saved', out)
    return dict_fact


if __name__ == '__main__':
    main(records_dir=sys.argv[1] if len(sys.argv) > 1 else None)
