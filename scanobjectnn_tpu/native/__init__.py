from scanobjectnn_tpu.native.bindings import (  # noqa: F401
    available,
    fps,
    query_ball_point,
    group_point,
    group_point_grad,
    selection_sort_knn,
    three_nn,
    three_interpolate,
    render_ball,
)
