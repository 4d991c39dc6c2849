"""modl_tpu: TPU-native online matrix factorization (SOMF/OMF).

A ground-up JAX/XLA re-design of the capabilities of arthurmensch/modl:
streaming dictionary learning with stochastic feature subsampling, for
dense data (images, fMRI) and missing data (collaborative filtering),
with sklearn-compatible estimators.
"""
__version__ = "0.1.0"

from .decomposition.dict_fact import Coder, DictFact
from .decomposition.fmri import fMRICoder, fMRIDictFact
from .decomposition.image import ImageDictFact
from .decomposition.recsys import RecsysDictFact

__all__ = ["DictFact", "Coder", "fMRIDictFact", "fMRICoder",
           "ImageDictFact", "RecsysDictFact"]
