from scanobjectnn_tpu.viz.render import (  # noqa: F401
    draw_point_cloud,
    point_cloud_three_views,
    point_cloud_to_volume,
    volume_to_point_cloud,
)
from scanobjectnn_tpu.viz.cmat import plot_confusion_matrix  # noqa: F401
