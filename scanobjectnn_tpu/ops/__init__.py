"""Point-cloud ops: the TPU-native replacement for the reference's custom
CUDA/C++ TF ops (/root/reference/pointnet2/tf_ops/*, SpiderCNN/tf_ops/* are
byte-identical copies).

Every op has a pure lax/XLA implementation (differentiable where the reference
registers a gradient — here autodiff through gathers gives the same scatter-add
semantics as the reference's atomicAdd backward kernels).  Hot ops additionally
have Pallas TPU kernels (ops.pallas) selected via ``set_backend`` /
``SCANOBJECTNN_OPS_BACKEND`` env var.
"""

from scanobjectnn_tpu.ops.fps import (
    farthest_point_sample,
    farthest_point_sample_with_coords,
    gather_point,
    prob_sample,
    prob_sample_pdf,
)
from scanobjectnn_tpu.ops.grouping import (
    pairwise_squared_distance,
    query_ball_point,
    query_ball_group,
    query_ball_group_multi,
    group_point,
    knn_point,
    knn_graph,
)
from scanobjectnn_tpu.ops.interpolate import three_nn, three_interpolate
from scanobjectnn_tpu.ops.emd import auction_match, emd_loss

__all__ = [
    "farthest_point_sample",
    "farthest_point_sample_with_coords",
    "gather_point",
    "prob_sample",
    "prob_sample_pdf",
    "pairwise_squared_distance",
    "query_ball_point",
    "query_ball_group",
    "query_ball_group_multi",
    "group_point",
    "knn_point",
    "knn_graph",
    "three_nn",
    "three_interpolate",
    "auction_match",
    "emd_loss",
]
