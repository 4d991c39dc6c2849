"""Image decomposition experiment (reference: exps/exp_decompose_images.py).

Sacred-less: uses modl_tpu.utils.experiment.Experiment with a
FileStorageObserver-style run directory (config.json / info.json).
"""
import sys
import time

sys.path.insert(0, '.')

import numpy as np

from modl_tpu.decomposition.image import DictionaryScorer, ImageDictFact
from modl_tpu.feature_extraction.image import LazyCleanPatchExtractor
from modl_tpu.utils.experiment import Experiment
from modl_tpu.utils.system import get_output_dir

exp = Experiment('decompose_images')


@exp.config
def config():
    return dict(source='face',
                batch_size=200,
                learning_rate=0.92,
                reduction=8,
                alpha=0.08,
                n_epochs=4,
                n_components=128,
                patch_size=16,
                test_size=2000,
                method='masked',
                setting='dictionary learning',
                seed=0)


@exp.main
def main(source, batch_size, learning_rate, reduction, alpha, n_epochs,
         n_components, patch_size, test_size, method, setting, seed, _run):
    from modl_tpu.datasets.image import load_image, make_synthetic_image
    try:
        image = load_image(source, gray=(source == 'face'))
    except Exception:
        image = make_synthetic_image(256, 256)

    extractor = LazyCleanPatchExtractor(patch_size=(patch_size, patch_size),
                                        max_patches=test_size,
                                        random_state=seed + 1)
    test_patches = extractor.fit(image).transform()

    scorer = DictionaryScorer(test_patches, info=_run.info)
    dict_fact = ImageDictFact(method=method, setting=setting,
                              n_components=n_components,
                              batch_size=batch_size,
                              reduction=reduction,
                              patch_size=(patch_size, patch_size),
                              n_epochs=n_epochs, alpha=alpha,
                              learning_rate=learning_rate,
                              callback=scorer, verbose=5,
                              random_state=seed)
    t0 = time.perf_counter()
    dict_fact.fit(image)
    _run.info['fit_time'] = time.perf_counter() - t0
    final = float(dict_fact.score(test_patches))
    _run.info['final_score'] = final
    np.save('%s/components.npy' % _run.dir, dict_fact.components_)
    return final


if __name__ == '__main__':
    exp.output_dir = '%s/decompose_images' % get_output_dir()
    exp.run()
