"""Support utilities (reference: modl/utils/__init__.py)."""
import numpy as np


def get_sub_slice(indices, sub_indices):
    """Safe nested-slice indexer (modl/utils/__init__.py:4-27)."""
    if indices is None:
        if isinstance(sub_indices, slice):
            return np.arange(sub_indices.start, sub_indices.stop)
        return sub_indices
    if isinstance(indices, slice):
        return np.arange(indices.start + sub_indices.start,
                         indices.start + sub_indices.stop)
    return indices[sub_indices]


def concatenated_cv(cvs):
    """Zip several CV generators into concatenated folds
    (modl/utils/__init__.py:30-38)."""
    for this_train, this_test in cvs[0]:
        train = [this_train]
        test = [this_test]
        for cv in cvs[1:]:
            this_train, this_test = next(cv)
            train.append(this_train)
            test.append(this_test)
        yield np.concatenate(train), np.concatenate(test)
