"""scanobjectnn_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for real-world
point-cloud classification and segmentation, with the full capability surface of
the ScanObjectNN reference codebase (hkust-vgd/scanobjectnn).

The reference is six vendored TF1 forks (pointnet, pointnet2, dgcnn, PointCNN,
SpiderCNN, 3DmFV-Net) sharing a dataset layer.  This framework is ONE library:

  data/      dataset I/O, splits, label maps, epoch pipeline   (ref: data_utils.py)
  augment/   pure-JAX keyed-RNG batch augmentations            (ref: provider.py)
  ops/       point-cloud ops: FPS, ball query, grouping, kNN,
             3-NN interpolation — lax reference impls + Pallas
             TPU kernels                                       (ref: tf_ops/*)
  nn/        layer library: shared MLPs, scheduled-momentum BN,
             edge-conv, X-conv, spider-conv, Fisher vectors    (ref: utils/tf_util.py)
  models/    PointNet, PointNet++ (SSG/MSG/BGA), DGCNN (+BGA),
             PointCNN, SpiderCNN, 3DmFV                        (ref: models/*)
  train/     pjit-sharded train/eval loops, voting evaluation,
             cross-domain evaluation, checkpointing            (ref: train*.py, evaluate*.py)
  parallel/  device-mesh + sharding helpers
  viz/       three-view renderer, PLY export, confusion matrix (ref: utils/pc_util.py)
"""

__version__ = "0.1.0"

from scanobjectnn_tpu.data import io as data_io  # noqa: F401
from scanobjectnn_tpu.data import mappings  # noqa: F401
