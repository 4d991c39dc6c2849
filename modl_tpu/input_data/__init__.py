from .image import clean_mask, fill, scale_patches
