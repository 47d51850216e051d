#!/bin/bash
# Chain part f (exp root own3): FULL restart from the shape stage after
# the sliver-gate raster fix (commit 2474999) — the own2 chain's 108-view
# renders carried TPU-only screen-crossing spikes (pretrain IoU 0.57),
# so everything downstream of stage 1 was tainted and own2 was killed at
# sculpt iter 8200. Same resumable structure as part e: stages skip on an
# existing schedule_log row, pretrain/sculpt resume from checkpoints,
# 2 attempts per stage, rows mirror into docs/artifacts/ at stage end;
# run detached (setsid) so it survives session death.
set -x
cd /root/repo
EXP=exp/reference_schedule_own3
LOG=$EXP/schedule_log.jsonl
R=$PWD/$EXP/shape/render
OBJ=$PWD/$EXP/shape/coarse.obj

done_row() { grep -q "\"stage\": \"$1\"" "$LOG" 2>/dev/null; }

run_stage() {  # run_stage <row-marker> <timeout-s> <args...>
  local marker=$1 tmo=$2; shift 2
  if done_row "$marker"; then echo "SKIP $marker (row exists)"; return 0; fi
  for attempt in 1 2; do
    timeout "$tmo" python scripts/run_reference_schedule.py "$@" \
      && return 0
    echo "STAGE $marker attempt $attempt failed (rc=$?)"
    sleep 30
  done
  return 1
}

run_stage shape 1500 --stage shape --exp_root $EXP --pose_type t_pose
run_stage pretrain 4200 --stage pretrain --exp_root $EXP --data_dir $R \
  --pretrain_iters 100000
if ! grep -q pretrain_eval "$EXP/.eval_done" 2>/dev/null; then
  timeout 1200 python scripts/eval_photometric.py --exp $PWD/$EXP/pretrain \
    --data_dir $R >> $EXP/pretrain_eval.json \
    && echo pretrain_eval >> $EXP/.eval_done
  cp $EXP/pretrain_eval.json docs/artifacts/own2_pretrain_eval.json || true
fi
run_stage sculpt_eval_after 5400 --stage sculpt --exp_root $EXP \
  --data_dir $R --sculpt_data_dir '' --template_obj $OBJ \
  --pose_type t_pose --is_continue
run_stage extract 2400 --stage extract --exp_root $EXP --data_dir $R \
  --sculpt_data_dir '' --template_obj $OBJ --pose_type t_pose
run_stage export 1500 --stage export --exp_root $EXP --data_dir $R \
  --sculpt_data_dir '' --template_obj $OBJ --pose_type t_pose
run_stage pose_vposer_codebook 900 --stage pose --exp_root $EXP \
  --strategy vposer_codebook
run_stage motion_interpolation 900 --stage motion --exp_root $EXP \
  --strategy interpolation
run_stage pose_vposer_realnvp 1500 --stage pose --exp_root $EXP \
  --strategy vposer_realnvp
run_stage pose_pose_optimizer 2400 --stage pose --exp_root $EXP \
  --strategy pose_optimizer
run_stage pose_vposer_optimizer 2400 --stage pose --exp_root $EXP \
  --strategy vposer_optimizer
run_stage motion_motion_optimizer 3600 --stage motion --exp_root $EXP \
  --strategy motion_optimizer
echo "CHAIN_OWN2E DONE $(date)"
