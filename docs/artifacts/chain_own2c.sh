#!/bin/bash
# Chain relaunch (part c): pretrain trimmed 150k -> 100k (train PSNR
# plateaus by ~60-100k on this data and the stage only seeds the sculpt;
# buys the animate matrix ~19 min of chip before round cutoff) and the
# animate stages run fastest-first so the most rows land. Resumes
# pretrain from ckpt_050000.
set -x
cd /root/repo
EXP=exp/reference_schedule_own2
R=$PWD/$EXP/shape/render
OBJ=$PWD/$EXP/shape/coarse.obj
timeout 3000 python scripts/run_reference_schedule.py --stage pretrain \
  --exp_root $EXP --data_dir $R --pretrain_iters 100000
timeout 1200 python scripts/eval_photometric.py --exp $PWD/$EXP/pretrain \
  --data_dir $R >> $EXP/pretrain_eval.json
timeout 7200 python scripts/run_reference_schedule.py --stage sculpt \
  --exp_root $EXP --data_dir $R --sculpt_data_dir '' \
  --template_obj $OBJ --pose_type t_pose
timeout 2400 python scripts/run_reference_schedule.py --stage extract \
  --exp_root $EXP --data_dir $R --sculpt_data_dir '' \
  --template_obj $OBJ --pose_type t_pose
timeout 1500 python scripts/run_reference_schedule.py --stage export \
  --exp_root $EXP --data_dir $R --sculpt_data_dir '' \
  --template_obj $OBJ --pose_type t_pose
timeout 900 python scripts/run_reference_schedule.py --stage pose \
  --exp_root $EXP --strategy vposer_codebook
timeout 900 python scripts/run_reference_schedule.py --stage motion \
  --exp_root $EXP --strategy interpolation
timeout 1500 python scripts/run_reference_schedule.py --stage pose \
  --exp_root $EXP --strategy vposer_realnvp
timeout 2400 python scripts/run_reference_schedule.py --stage pose \
  --exp_root $EXP --strategy pose_optimizer
timeout 2400 python scripts/run_reference_schedule.py --stage pose \
  --exp_root $EXP --strategy vposer_optimizer
timeout 3600 python scripts/run_reference_schedule.py --stage motion \
  --exp_root $EXP --strategy motion_optimizer
echo "CHAIN_OWN2C DONE $(date)"
