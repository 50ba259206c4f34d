from scanobjectnn_tpu.viz.render import (  # noqa: F401
    draw_point_cloud,
    point_cloud_three_views,
    point_cloud_to_volume,
    volume_to_point_cloud,
)
from scanobjectnn_tpu.viz.cmat import plot_confusion_matrix  # noqa: F401
from scanobjectnn_tpu.viz.fvplots import (  # noqa: F401
    draw_gaussians,
    visualize_fv,
    visualize_pc,
    visualize_pc_seg,
    visualize_pc_seg_diff,
)
