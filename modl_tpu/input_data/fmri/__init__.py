from .base import (BaseNilearnEstimator, NumpyMasker,
                   check_embedded_masker, check_embedded_nifti_masker,
                   safe_to_filename)
from .fixes import monkey_patch_nifti_image, monkey_patch_nilearn_caching
from .rest import create_raw_rest_data, get_raw_rest_data
from .unmask import MultiRawMasker
