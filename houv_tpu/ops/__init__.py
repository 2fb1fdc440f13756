from houv_tpu.ops.chamfer import (
    chamfer,
    chamfer_indices,
    chamfer_reference,
    pairwise_sqdist,
)
from houv_tpu.ops.emd import emd_auction
from houv_tpu.ops.emd_kernel import emd_auction_pallas
from houv_tpu.ops.sampling import (
    furthest_point_sample,
    furthest_point_sample_with_dist,
)
from houv_tpu.ops.grouping import (
    gather_points,
    grouping_operation,
    index_points,
    knn,
    knn_indices_pallas,
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
from houv_tpu.ops.scatter import scatter_add_matmul, gather_rows_matmul
from houv_tpu.ops.image import roi_align, sigmoid_focal_loss
from houv_tpu.ops.boxes import (
    boxes_iou_bev,
    boxes_iou_bev_sampled,
    boxes_overlap_bev,
    nms_bev,
    points_in_boxes,
    assign_score_withk,
)
from houv_tpu.ops.sparse_conv import (
    SparseGrid,
    from_point_voxels,
    build_lookup,
    subm_conv,
    sparse_conv_down,
    to_dense,
    masked_max,
)

__all__ = [
    "chamfer",
    "chamfer_indices",
    "chamfer_reference",
    "pairwise_sqdist",
    "emd_auction",
    "emd_auction_pallas",
    "furthest_point_sample",
    "furthest_point_sample_with_dist",
    "gather_points",
    "grouping_operation",
    "index_points",
    "knn",
    "knn_indices_pallas",
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
    "scatter_add_matmul",
    "gather_rows_matmul",
    "roi_align",
    "sigmoid_focal_loss",
    "boxes_iou_bev",
    "boxes_iou_bev_sampled",
    "boxes_overlap_bev",
    "nms_bev",
    "points_in_boxes",
    "assign_score_withk",
    "SparseGrid",
    "from_point_voxels",
    "build_lookup",
    "subm_conv",
    "sparse_conv_down",
    "to_dense",
    "masked_max",
]
