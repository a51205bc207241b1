"""pb_llm_tpu — TPU-native partially-binarized LLM framework.

A from-scratch JAX/XLA/Pallas framework with the capabilities of PB-LLM
(arXiv:2310.00034, reference implementation hahnyuan/PB-LLM): most LLM
weights binarized to +-1 (XNOR-style: per-row/group mean-centering + sign +
abs-mean scale) while a small *salient* fraction — selected by magnitude or
Hessian sensitivity — is kept at 8 bits.

Unlike the reference (pure-PyTorch simulated quantization), this framework
stores weights truly bit-packed (PBW format: sign bitplane + salient-mask
bitplane + int8 sidecar + scales), runs them through fused Pallas
unpack+select+matmul kernels, and shards packed planes + KV-cache over a
`jax.sharding.Mesh` for multi-chip / multi-host serving.

Top-level layout:
  core/      PBW checkpoint format, bit packing, typed configs
  ops/       Pallas kernels + pure-XLA reference implementations
  quant/     low (binary/2/4-bit) and high (8-bit) quantizers, QAT STE layers
  calib/     Hessian accumulation + GPTQ-PB solver (reference: gptq_pb/gptq.py)
  models/    LLaMA + OPT in pure JAX with HF weight import
  parallel/  mesh, sharding rules, collectives
  runtime/   inference engine: KV cache, decode loop, continuous batching
  data/      calibration / eval / QAT dataset loaders
  eval/      windowed perplexity (exact reference protocol) + task harness
  train/     QAT fine-tuning loop (optax)
  utils/     metrics, profiling, checkpoint helpers
"""

__version__ = "0.1.0"
