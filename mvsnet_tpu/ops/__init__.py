"""Pure compute ops: geometry, warping, cost volumes, depth regression."""

from mvsnet_tpu.ops.geometry import (  # noqa: F401
    depth_values,
    get_homographies,
    get_homographies_inv_depth,
    homographies_for_views,
)
from mvsnet_tpu.ops.warp import homography_warp, warp_by_homographies  # noqa: F401
from mvsnet_tpu.ops.cost_volume import plane_sweep_cost_volume  # noqa: F401
from mvsnet_tpu.ops.depth import (  # noqa: F401
    soft_argmin,
    soft_argmin_prob_map,
    probability_map,
    winner_take_all_update,
)
