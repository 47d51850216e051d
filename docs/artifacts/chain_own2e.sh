#!/bin/bash
# Chain relaunch (part e): part d died with its launching session (API
# outage killed the session ~27 min into the pretrain compile; background
# Bash tasks die with the session). This relaunch is (1) run under tmux so
# it survives session death, and (2) RESUMABLE: each stage is skipped if
# its schedule_log row already exists, and pretrain/sculpt resume from
# checkpoints (--is_continue / is_continue=True in the driver). Same
# schedule as parts c/d: shape (done 02:52) -> pretrain 100k -> eval ->
# sculpt 30,010 -> extract 512^3 -> export -> animate matrix
# fastest-first. Rows mirror into docs/artifacts/ at stage end.
set -x
cd /root/repo
EXP=exp/reference_schedule_own2
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
