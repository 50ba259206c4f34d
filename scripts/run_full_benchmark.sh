#!/usr/bin/env bash
# Full ScanObjectNN benchmark reproduction (requires the real h5 dataset,
# obtainable from the authors — see training_data/README.md in the reference).
#
# Point DATA at the directory containing h5_files/.
set -euo pipefail
DATA="${DATA:-./data}"
SPLIT="${SPLIT:-main_split}"          # main_split | split1..4
VARIANT="${VARIANT:-_augmentedrot_scale75}"  # '' (OBJ_BG) | _augmented25_norot | _augmented25rot | _augmentedrot | _augmentedrot_scale75 (PB_T50_RS)
TRAIN="$DATA/h5_files/$SPLIT/training_objectdataset$VARIANT.h5"
TEST="$DATA/h5_files/$SPLIT/test_objectdataset$VARIANT.h5"
VOTES="${VOTES:-12}"

run() { python -m scanobjectnn_tpu.train.cli "$@" --train_file "$TRAIN" --test_file "$TEST"; }

# Classification families (paper Table 5 rows):
for MODEL in pointnet_cls pointnet2_cls_ssg dgcnn pointcnn_cls spidercnn_cls_xyz 3dmfv_net_cls; do
  run train    --model "$MODEL" --log_dir "log/$MODEL" --max_epoch 250
  run evaluate --model "$MODEL" --log_dir "log/$MODEL" --num_votes "$VOTES"
done

# BGA joint classification+segmentation:
for MODEL in pointnet2_cls_bga dgcnn_bga pointnet_seg pointcnn_seg; do
  run train_seg    --model "$MODEL" --log_dir "log/$MODEL" --max_epoch 250
  run evaluate_seg --model "$MODEL" --log_dir "log/$MODEL" --num_votes "$VOTES"
done

# Part segmentation:
run train_partseg    --model pointnet2_cls_partseg --num_class 6 --batch_size 8 \
    --learning_rate 1e-4 --log_dir log/partseg
run evaluate_partseg --model pointnet2_cls_partseg --num_class 6 --log_dir log/partseg

# Cross-domain (needs a ModelNet40 h5 as --test_file):
# run evaluate_cross_domain --direction synthetic_on_real --model pointnet2_cls_ssg \
#     --log_dir log/pointnet2_cls_ssg --test_file "$MODELNET_H5"

# Confusion matrices:
run draw_cmat --model pointnet2_cls_ssg --log_dir log/pointnet2_cls_ssg
