"""Streamed HF checkpoint → PBW conversion for models larger than host RAM.

`hf_import.from_pretrained` materializes the whole state dict before
assembly — fine for 1-13B on a big host, wrong for anything bigger.  This
module walks the checkpoint shard-by-shard (safetensors preferred: true
zero-copy per-tensor reads), buffers at most the tensors of layers still
incomplete, packs each decoder layer the moment its weights are all seen,
flushes it through `core.pbw.PBWShardWriter`, and frees it.  Peak host
memory is O(one shard + partial layers), independent of model size.

Reference counterpart: none — `gptq_pb/run.py:117` loads the full model to
fp16 and streams *layers to the GPU*, not the checkpoint to the packer.

The packing itself is calibration-free (RTN-style: magnitude salience), the
right trade for conversion-time quantization of huge checkpoints; the
calibrated GPTQ path stays in `calib.pipeline` (which needs live
activations and therefore a resident model).
"""

from __future__ import annotations

import json
import os
import re
from typing import Callable, Dict, Iterator, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from ..core import pbw
from ..quant.high_quant import high_calibrate, high_quantize
from ..quant.low_quant import low_calibrate, low_quantize

# our layer-param name → HF submodule path inside model(.decoder).layers.{i}.
_HF_LINEAR = {
    "llama": {
        "q_proj": "self_attn.q_proj", "k_proj": "self_attn.k_proj",
        "v_proj": "self_attn.v_proj", "o_proj": "self_attn.o_proj",
        "gate_proj": "mlp.gate_proj", "up_proj": "mlp.up_proj",
        "down_proj": "mlp.down_proj",
    },
    "opt": {
        "q_proj": "self_attn.q_proj", "k_proj": "self_attn.k_proj",
        "v_proj": "self_attn.v_proj", "out_proj": "self_attn.out_proj",
        "fc1": "fc1", "fc2": "fc2",
    },
}
_LAYER_RE = {
    "llama": re.compile(r"^model\.layers\.(\d+)\.(.+)$"),
    "opt": re.compile(r"^model\.decoder\.layers\.(\d+)\.(.+)$"),
}


def _shard_files(model_dir: str) -> Tuple[str, list]:
    """→ (kind, files): kind in {"safetensors", "torch"}."""
    for index, kind in (("model.safetensors.index.json", "safetensors"),
                        ("pytorch_model.bin.index.json", "torch")):
        ip = os.path.join(model_dir, index)
        if os.path.exists(ip):
            with open(ip) as fh:
                files = sorted(set(json.load(fh)["weight_map"].values()))
            return kind, [os.path.join(model_dir, f) for f in files]
    for single, kind in (("model.safetensors", "safetensors"),
                         ("pytorch_model.bin", "torch")):
        sp = os.path.join(model_dir, single)
        if os.path.exists(sp):
            return kind, [sp]
    raise FileNotFoundError(f"no HF weights found under {model_dir}")


def iter_hf_tensors(model_dir: str) -> Iterator[Tuple[str, np.ndarray]]:
    """Yield (key, float32 ndarray) one tensor at a time across all shards."""
    kind, files = _shard_files(model_dir)
    if kind == "safetensors":
        from safetensors import safe_open

        for f in files:
            # torch framework handles bf16/fp16 storage; one tensor at a time
            with safe_open(f, framework="pt") as sf:
                for key in sf.keys():
                    yield key, sf.get_tensor(key).float().numpy()
    else:
        import torch

        for f in files:
            sd = torch.load(f, map_location="cpu", weights_only=True)
            for key, t in sd.items():
                yield key, t.float().numpy()


class StreamedLayerLoader:
    """Layer-at-a-time checkpoint access for >RAM GPTQ calibration
    (VERDICT r2 item 6).

    Builds a key→shard map once (free for safetensors via the index /
    header; torch bins fall back to O(shard) loads), then serves
    ``layer_params(i)`` — exactly one decoder layer's tensors read from disk
    and assembled into the family's layer pytree — and
    ``non_layer_params()`` (embeddings/norms/head; small).  ``release(i)``
    drops the layer; ``max_live`` records the peak number of concurrently
    resident layers so callers can ASSERT peak host memory stayed O(layer).
    """

    def __init__(self, model_dir: str, family: str):
        self.model_dir = model_dir
        self.family = family
        self.kind, self.files = _shard_files(model_dir)
        self.key_file: Dict[str, str] = {}
        if self.kind == "safetensors":
            from safetensors import safe_open

            for f in self.files:
                with safe_open(f, framework="np") as sf:
                    for k in sf.keys():
                        self.key_file[k] = f
        else:
            import torch

            for f in self.files:
                for k in torch.load(f, map_location="cpu", weights_only=True).keys():
                    self.key_file[k] = f
        self._layer_re = _LAYER_RE[family]
        self._live: set = set()
        self.max_live = 0

    def n_layers(self) -> int:
        mx = -1
        for k in self.key_file:
            m = self._layer_re.match(k)
            if m:
                mx = max(mx, int(m.group(1)))
        return mx + 1

    def _read_keys(self, keys) -> Dict[str, np.ndarray]:
        by_file: Dict[str, list] = {}
        for k in keys:
            by_file.setdefault(self.key_file[k], []).append(k)
        out: Dict[str, np.ndarray] = {}
        if self.kind == "safetensors":
            from safetensors import safe_open

            for f, ks in by_file.items():
                with safe_open(f, framework="pt") as sf:
                    for k in ks:
                        out[k] = sf.get_tensor(k).float().numpy()
        else:
            import torch

            for f, ks in by_file.items():
                sd = torch.load(f, map_location="cpu", weights_only=True)
                for k in ks:
                    out[k] = sd[k].float().numpy()
        return out

    def non_layer_params(self, cfg, dtype=jnp.float32) -> Dict:
        from . import hf_import

        keys = [k for k in self.key_file if not self._layer_re.match(k)]
        sd = self._read_keys(keys)
        fn = (hf_import.llama_nonlayer_from_sd if self.family == "llama"
              else hf_import.opt_nonlayer_from_sd)
        return fn(sd, cfg, dtype)

    def layer_params(self, i: int, dtype=jnp.float32) -> Dict:
        from . import hf_import

        prefix = (f"model.layers.{i}." if self.family == "llama"
                  else f"model.decoder.layers.{i}.")
        sd = self._read_keys([k for k in self.key_file if k.startswith(prefix)])
        self._live.add(i)
        self.max_live = max(self.max_live, len(self._live))
        fn = (hf_import.llama_layer_from_sd if self.family == "llama"
              else hf_import.opt_layer_from_sd)
        return fn(sd, i, dtype)

    def release(self, i: int) -> None:
        self._live.discard(i)


def rtn_pack_fn(method: str = "xnor", low_frac: float = 0.9, high_bit: int = 8,
                fmt: str = "packed_v2", groupsize: int = -1,
                pack_block: Optional[int] = None, ic_shards: int = 1) -> Callable:
    """Calibration-free packer: |w| salience (reference low_frac semantics,
    `gptq_pb/run.py:122-125` RTN branch), 8-bit sidecar for salient weights.

    For tensor-parallel deployment pack with ``ic_shards=tp`` (shard-major v2
    sidecar; selection balanced per ic shard) and a ``pack_block`` dividing
    ic/tp for the row-parallel layers (see `runtime.tp_engine`)."""

    def pack(name: str, w_oc_ic: np.ndarray, bias: Optional[np.ndarray]):
        w = jnp.asarray(w_oc_ic, jnp.float32)
        b = None if bias is None else jnp.asarray(bias, jnp.float32)
        if fmt == "packed_v2":
            metric = jnp.abs(w)
            mask = pbw.column_structured_mask(metric, low_frac, col_tile=0,
                                              ic_shards=ic_shards)
        else:
            thresh = jnp.quantile(jnp.abs(w), low_frac)
            mask = jnp.abs(w) <= thresh
        low_state = low_calibrate(w * mask, method)
        high_state = high_calibrate(w, bits=high_bit)
        w_q = jnp.where(mask, low_quantize(w, low_state, method), high_quantize(w, high_state))
        if fmt == "packed_v2":
            p, _diag = pbw.pack_linear_v2(w_q, mask, low_state, high_state, method,
                                          col_tile=0, bias=b, pack_block=pack_block,
                                          ic_shards=ic_shards)
        else:
            p, _diag = pbw.pack_linear(w_q, mask, low_state, high_state, method,
                                       bias=b, groupsize=groupsize,
                                       pack_block=pack_block)
        return p

    return pack


def stream_pack_to_pbw(
    model_dir: str,
    out_dir: str,
    family: str,
    pack_fn: Optional[Callable] = None,
    min_layer: int = 0,
    max_layer: int = 10 ** 9,
) -> Dict[str, str]:
    """Convert an HF checkpoint dir to a sharded PBW artifact, one decoder
    layer resident at a time.  Returns {layer_key: shard_file}."""
    pack_fn = pack_fn or rtn_pack_fn()
    lin_map = _HF_LINEAR[family]
    sub_to_name = {v: k for k, v in lin_map.items()}
    layer_re = _LAYER_RE[family]

    # expected per-layer keys from a cheap key listing (no tensor loads for
    # safetensors; torch bins fall back to the shard read itself)
    expected: Dict[int, set] = {}
    kind, files = _shard_files(model_dir)
    keys: list = []
    if kind == "safetensors":
        from safetensors import safe_open

        for f in files:
            with safe_open(f, framework="np") as sf:
                keys.extend(sf.keys())
    else:
        import torch

        for f in files:
            keys.extend(torch.load(f, map_location="cpu", weights_only=True).keys())
    for key in keys:
        m = layer_re.match(key)
        if not m:
            continue
        i, rest = int(m.group(1)), m.group(2)
        sub = rest.rsplit(".", 1)[0]
        if sub in sub_to_name:
            expected.setdefault(i, set()).add(rest)

    writer = pbw.PBWShardWriter(out_dir)
    buffers: Dict[int, Dict[str, np.ndarray]] = {}
    done: Dict[str, str] = {}

    def flush(i: int) -> None:
        buf = buffers.pop(i)
        for sub, name in sub_to_name.items():
            wk, bk = sub + ".weight", sub + ".bias"
            if wk not in buf:
                continue
            packed = pack_fn(name, buf[wk], buf.get(bk))
            key = f"layer_{i}/{name}"
            writer.add_layer(key, packed)
            done[key] = writer._files[key]

    for key, tensor in iter_hf_tensors(model_dir):
        m = layer_re.match(key)
        if not m:
            continue  # embeddings/norms stay in the dense checkpoint
        i, rest = int(m.group(1)), m.group(2)
        if i < min_layer or i >= max_layer or i not in expected:
            continue
        buffers.setdefault(i, {})[rest] = tensor
        if set(buffers[i]) >= expected[i]:
            flush(i)
    for i in sorted(buffers):  # safety: incomplete-ordering stragglers
        if set(buffers[i]) >= expected.get(i, set()):
            flush(i)

    writer.finalize({"source": os.path.abspath(model_dir), "family": family})
    return done
