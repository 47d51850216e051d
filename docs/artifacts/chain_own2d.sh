#!/bin/bash
# Chain relaunch (part d): the machine reset after the round-5 tunnel
# outage wiped exp/ AND .jax_cache, so the post-fix chain restarts from
# the shape stage with all-fresh compiles. Same schedule as part c
# (pretrain 100k: train PSNR plateaus by ~60-100k on this data and the
# stage only seeds the sculpt), but from scratch. Core chain first
# (shape -> pretrain -> eval -> sculpt -> extract -> export), then the
# animate matrix fastest-first so the most rows land before cutoff.
# Every stage row is mirrored into docs/artifacts/ by log_stage, so a
# second reset cannot lose the evidence.
set -x
cd /root/repo
EXP=exp/reference_schedule_own2
R=$PWD/$EXP/shape/render
OBJ=$PWD/$EXP/shape/coarse.obj
timeout 1500 python scripts/run_reference_schedule.py --stage shape \
  --exp_root $EXP --pose_type t_pose
timeout 3600 python scripts/run_reference_schedule.py --stage pretrain \
  --exp_root $EXP --data_dir $R --pretrain_iters 100000
timeout 1200 python scripts/eval_photometric.py --exp $PWD/$EXP/pretrain \
  --data_dir $R >> $EXP/pretrain_eval.json
timeout 5400 python scripts/run_reference_schedule.py --stage sculpt \
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
echo "CHAIN_OWN2D DONE $(date)"
