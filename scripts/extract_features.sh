#!/bin/bash
# Offline feature-extraction pipeline, end to end (the reference's
# scripts/extract_* stages chained in dependency order):
#
#   bash scripts/extract_features.sh <VIDEO_DIR> <OUT_DIR> <ANNOT_JSON> [WEIGHTS]
#
# VIDEO_DIR   directory of raw .mp4 videos
# OUT_DIR     output root; per-stage subdirectories are created under it
# ANNOT_JSON  the MUSIC-AVQA annotation file (for question/prompt features)
# WEIGHTS     optional converted .npz checkpoint for the CLIP/ToMe towers;
#             omitted -> --random-weights (pipeline smoke mode)
#
# Every stage is resumable (skip-if-output-exists), so rerunning this script
# continues where it left off.
set -eu

if [[ $# -lt 3 ]]; then
    echo 'usage: extract_features.sh <VIDEO_DIR> <OUT_DIR> <ANNOT_JSON> [WEIGHTS]'
    exit 1
fi
videos=$1
out=$2
annot=$3
w_args=(--random-weights)
if [[ $# -ge 4 ]]; then
    w_args=(--weights "$4")
fi

extract() { python -m qa_tiger_tpu.pipeline.extract "$@"; }

extract frames    --src "$videos"       --dst "$out/frames_1fps"
extract audio     --src "$videos"       --dst "$out/wavs"
extract vggish    --src "$out/wavs"     --dst "$out/vggish" "${w_args[@]}"
extract clip      --src "$out/frames_1fps" --dst "$out/clip_feats" "${w_args[@]}"
extract tome      --src "$out/frames_1fps" --dst "$out/tome_feats" "${w_args[@]}"
extract questions --annot "$annot" --dst "$out/qst_feats" "${w_args[@]}"
extract prompts   --annot "$annot" --dst "$out/prompt_feats" "${w_args[@]}"
