from .image import LazyCleanPatchExtractor
