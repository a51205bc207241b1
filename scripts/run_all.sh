#!/usr/bin/env bash
# Canonical experiment matrix — parity with the reference's sweep script
# (`gptq_pb/run_all.sh`): the llama-7b hessian sweep, plus the opt-1.3b grid
# with groupsize and RTN (--disable_gptq) ablations, plus BASELINE.json's
# CPU-runnable opt-125m magnitude config.
#
# All runs produce packed PBW checkpoints and salient-mask exports so the QAT
# hessian variant can consume them (--gptq_masks).
set -euo pipefail

PY="python -m pb_llm_tpu.cli.run_ptq"
OUT=${OUT:-outputs}

# BASELINE.json configs[0]: CPU-runnable minimum slice
$PY facebook/opt-125m wikitext2 xnor --low_frac 0.5 --high_bit 8 --salient_metric magnitude \
    --format packed --save_pbw "$OUT/opt125m_w2_xnor_0.5" --mask_out "$OUT/masks/opt125m_0.5.npz"

# llama-7b hessian sweep (reference run_all.sh:2-5)
for frac in 0.5 0.8 0.9 0.95; do
  $PY huggyllama/llama-7b c4 xnor --low_frac $frac --high_bit 8 --salient_metric hessian \
      --format packed --save_pbw "$OUT/llama7b_c4_xnor_$frac" --mask_out "$OUT/masks/llama7b_$frac.npz"
done

# opt-1.3b grid (reference run_all.sh:14-42): metric / groupsize / RTN ablations
for metric in magnitude hessian; do
  for frac in 0.8 0.9 0.95; do
    $PY facebook/opt-1.3b c4 xnor --low_frac $frac --high_bit 8 --salient_metric $metric \
        --format packed --save_pbw "$OUT/opt13b_c4_xnor_${frac}_${metric}"
  done
done
$PY facebook/opt-1.3b c4 xnor --low_frac 0.9 --high_bit 8 --salient_metric hessian --groupsize 128
$PY facebook/opt-1.3b c4 xnor --low_frac 0.9 --high_bit 8 --salient_metric hessian --disable_gptq

# QAT after PTQ masks (reference README.md:77-88 + hessian handoff)
python -m pb_llm_tpu.cli.run_qat --binarization_method=xnor_outlier_hessian \
    --model_id=facebook/opt-1.3b --train_steps=10000 --dataset=red_pajama \
    --outlier_fraction 0.1 --gptq_masks "$OUT/masks/opt13b_0.9.npz" || true
