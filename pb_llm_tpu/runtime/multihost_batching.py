"""Multi-host continuous batching: host-0 coordination over DCN.

In a multi-process TPU deployment every process must enqueue IDENTICAL
programs in the same order, so scheduling decisions cannot depend on
host-local state.  The split here:

  * deterministic-from-token-stream decisions (retire on EOS / budget /
    cache-full, slot freeing) replicate on every host for free — decode
    outputs are identical everywhere (greedy or shared-seed sampling);
  * the one nondeterministic input — WHICH request is admitted to a free
    slot and its prompt tokens — is decided by process 0 and broadcast with
    `multihost_utils.broadcast_one_to_all` (rides DCN) as a fixed-shape
    admission record before each scheduler tick.

With a single process the broadcast degenerates to identity and this class
behaves exactly like `runtime.batching.ContinuousBatcher` (tested); on a
pod it is the coordinator the BASELINE north star asks for.  The engine
underneath can be the single-chip `Engine` or a TP-sharded step
(`runtime.tp_engine`).
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import Dict, List, Optional, Sequence

import numpy as np

import jax

from .batching import BatcherStats, Request
from .engine import Engine


def _broadcast(arr: np.ndarray) -> np.ndarray:
    if jax.process_count() == 1:
        return arr
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.broadcast_one_to_all(arr))


@dataclasses.dataclass
class _Admission:
    slot: int
    request_id: int
    true_len: int
    prompt: np.ndarray  # padded to the admission record width


class MultiHostBatcher:
    def __init__(self, engine: Engine, max_admits_per_tick: int = 4, max_prompt: int = 512):
        self.engine = engine
        self.max_admits = max_admits_per_tick
        self.max_prompt = max_prompt
        self.is_host0 = jax.process_index() == 0
        self.queue: deque[Request] = deque()
        self.slot_to_request: Dict[int, Request] = {}
        self.stats = BatcherStats()

    def submit(self, req: Request) -> None:
        """Requests are fed on host 0; other hosts receive them via broadcast."""
        if self.is_host0:
            self.queue.append(req)

    def _admission_record(self) -> np.ndarray:
        """Fixed-shape [max_admits, 4 + max_prompt] int32 record:
        (slot, request_id, true_len, max_new_tokens, prompt...)  slot=-1 ⇒ empty."""
        rec = np.full((self.max_admits, 4 + self.max_prompt), -1, np.int32)
        if self.is_host0:
            free = [s for s in self.engine.free_slots() if s not in self.slot_to_request]
            for row, slot in enumerate(free[: self.max_admits]):
                if not self.queue:
                    break
                req = self.queue.popleft()
                ids = np.asarray(req.prompt_ids[: self.max_prompt], np.int32)
                rec[row, 0] = slot
                rec[row, 1] = req.request_id
                rec[row, 2] = len(ids)
                rec[row, 3] = req.max_new_tokens
                rec[row, 4 : 4 + len(ids)] = ids
                # host 0 keeps the rich Request object
                self.slot_to_request[slot] = req
        return rec

    def _apply_admissions(self, rec: np.ndarray) -> None:
        for row in rec:
            slot = int(row[0])
            if slot < 0:
                continue
            true_len = int(row[2])
            prompt = row[4 : 4 + true_len].tolist()
            if not self.is_host0:
                # non-host0 processes mirror with a shadow Request
                self.slot_to_request[slot] = Request(
                    request_id=int(row[1]), prompt_ids=prompt, max_new_tokens=int(row[3])
                )
            req = self.slot_to_request[slot]
            first = self.engine.prefill(slot, prompt)  # identical program everywhere
            self.stats.prefills += 1
            req.output_ids.append(first)
            self.stats.generated_tokens += 1
            self._maybe_retire(slot, first)

    def _maybe_retire(self, slot: int, token: int) -> None:
        req = self.slot_to_request[slot]
        hit_eos = req.eos_token_id is not None and token == req.eos_token_id
        done = (
            hit_eos
            or len(req.output_ids) >= req.max_new_tokens
            or self.engine.lengths[slot] + 1 >= self.engine.ecfg.max_seq
        )
        if done:
            req.done = True
            del self.slot_to_request[slot]
            self.engine.release(slot)

    def step(self) -> None:
        rec = _broadcast(self._admission_record())
        self._apply_admissions(rec)
        for slot, tok in self.engine.decode_step().items():
            req = self.slot_to_request.get(slot)
            if req is None:
                continue
            req.output_ids.append(tok)
            self.stats.generated_tokens += 1
            self._maybe_retire(slot, tok)
        self.stats.decode_steps += 1

    def pending(self) -> bool:
        """Any work left? Queue length must come from host 0's view."""
        local = np.asarray([len(self.queue) + len(self.slot_to_request)], np.int32)
        return int(_broadcast(local)[0]) > 0

    def run(self, requests: Sequence[Request]) -> List[Request]:
        import time

        for r in requests:
            self.submit(r)
        t0 = time.time()
        while self.pending():
            self.step()
        self.stats.wall_seconds += time.time() - t0
        return list(requests)
