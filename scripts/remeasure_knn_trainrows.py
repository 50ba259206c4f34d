#!/usr/bin/env python
"""Re-measure the training-step rows whose train path shares the round-5
manual-argmin kNN rounds (spidercnn, pointcnn) — keeps the BENCHMARKS.md
training table honest after the kernel change."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from remeasure_tables import time_train_step

for name in ("spidercnn_cls_xyz", "pointcnn_cls"):
    for dtype in ("float32", "bfloat16"):
        time_train_step(name, 32, dtype, "native")
