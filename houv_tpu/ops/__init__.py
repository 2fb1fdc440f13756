from houv_tpu.ops.chamfer import chamfer, chamfer_reference, pairwise_sqdist
from houv_tpu.ops.emd import emd_auction
from houv_tpu.ops.sampling import (
    furthest_point_sample,
    furthest_point_sample_with_dist,
)
from houv_tpu.ops.grouping import (
    gather_points,
    grouping_operation,
    index_points,
    knn,
    knn_points,
    ball_query,
    query_and_group,
)
from houv_tpu.ops.interpolate import three_nn, three_interpolate, three_nn_upsampling
from houv_tpu.ops.voxel import (
    voxel_grid_indices,
    voxelize_mean,
    voxelize_occupancy,
    voxelize_features_mean,
)

__all__ = [
    "chamfer",
    "chamfer_reference",
    "pairwise_sqdist",
    "emd_auction",
    "furthest_point_sample",
    "furthest_point_sample_with_dist",
    "gather_points",
    "grouping_operation",
    "index_points",
    "knn",
    "knn_points",
    "ball_query",
    "query_and_group",
    "three_nn",
    "three_interpolate",
    "three_nn_upsampling",
    "voxel_grid_indices",
    "voxelize_mean",
    "voxelize_occupancy",
    "voxelize_features_mean",
]
