from .base import BaseNilearnEstimator, NumpyMasker, check_embedded_masker
from .rest import create_raw_rest_data, get_raw_rest_data
from .unmask import MultiRawMasker
