from scanobjectnn_tpu.nn.layers import (  # noqa: F401
    BatchNorm,
    Dense,
    GroupNorm,
    MLP,
    PointMLP,
)
from scanobjectnn_tpu.nn.pointnet_modules import (  # noqa: F401
    SAModule,
    SAModuleMSG,
    FPModule,
    sample_and_group,
    sample_and_group_all,
)
