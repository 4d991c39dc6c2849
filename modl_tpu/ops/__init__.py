from .bcd_pallas import bcd_update, bcd_update_l2
from .enet import (enet_norm, enet_projection, enet_projection_batch,
                   enet_projection_bisect, enet_scale)
from .sampler import Sampler, draw_subset, init_sampler_state
from .solvers import (enet_cd_gram, enet_regression_multi_gram,
                      enet_regression_single_gram, ridge_multi_gram,
                      ridge_single_gram)
from .weights import batch_weight, sample_weight
