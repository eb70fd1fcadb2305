#!/bin/bash
# Stage runner for the full codec pipeline (capability twin of the
# reference's submit_codec_*.sh slurm scripts, stages 0-4):
#   0: train autoencoder      1: extract code statistics
#   2: train vocoder          3: test symAE (AE encoder + AE decoder)
#   4: test AE + vocoder
# Usage: scripts/run_codec_pipeline.sh --start 0 --stop 4 \
#            [--ae_config ...] [--voc_config ...] [--tag_prefix exp]
set -e
cd "$(dirname "$0")/.."

start=0
stop=4
ae_config=configs/autoencoder/symAD_vctk_48000_hop300.yaml
voc_config=configs/vocoder/AudioDec_v1_symAD_vctk_48000_hop300_clean.yaml
stats_config=configs/statistic/symAD_vctk_48000_hop300_clean.yaml
tag_prefix=exp
resume=""

while [ $# -gt 0 ]; do
  case "$1" in
    --start) start="$2"; shift 2 ;;
    --stop) stop="$2"; shift 2 ;;
    --ae_config) ae_config="$2"; shift 2 ;;
    --voc_config) voc_config="$2"; shift 2 ;;
    --stats_config) stats_config="$2"; shift 2 ;;
    --tag_prefix) tag_prefix="$2"; shift 2 ;;
    --ae_tag) ae_tag_override="$2"; shift 2 ;;
    --voc_tag) voc_tag_override="$2"; shift 2 ;;
    --resume) resume="--resume $2"; shift 2 ;;
    *) echo "unknown option $1"; exit 1 ;;
  esac
done

ae_tag="${ae_tag_override:-$tag_prefix/autoencoder/$(basename "$ae_config" .yaml)}"
voc_tag="${voc_tag_override:-$tag_prefix/vocoder/$(basename "$voc_config" .yaml)}"

run_stage() {
  local n="$1"; shift
  if [ "$start" -le "$n" ] && [ "$n" -le "$stop" ]; then
    echo "=== stage $n: $* ==="
    "$@"
  fi
}

run_stage 0 python -m audiodec_tpu.bin.codec_train \
    --config "$ae_config" --tag "$ae_tag" $resume
run_stage 1 python -m audiodec_tpu.bin.codec_stats \
    --config "$stats_config" \
    --analyzer "$ae_tag/checkpoint-final.ckpt"
run_stage 2 python -m audiodec_tpu.bin.codec_train \
    --config "$voc_config" --tag "$voc_tag"
run_stage 3 python -m audiodec_tpu.bin.codec_test \
    --encoder "$ae_tag/checkpoint-final.ckpt" \
    --decoder "$ae_tag/checkpoint-final.ckpt" --subset test
run_stage 4 python -m audiodec_tpu.bin.codec_test \
    --encoder "$ae_tag/checkpoint-final.ckpt" \
    --decoder "$voc_tag/checkpoint-final.ckpt" --subset test
