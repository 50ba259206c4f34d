"""Pallas TPU kernels for the hot point-cloud ops.

Selection: `scanobjectnn_tpu.ops` dispatches to these on TPU backends (and in
interpret mode for CPU testing); the lax implementations remain the reference
semantics and the fallback.
"""

from scanobjectnn_tpu.ops.pallas.fps_kernel import fps_pallas  # noqa: F401
