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
from .engine import Engine, PoolExhausted


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
    def __init__(self, engine: Engine, max_admits_per_tick: int = 4, max_prompt: int = 512,
                 draft_source=None):
        self.engine = engine
        self.max_admits = max_admits_per_tick
        self.max_prompt = max_prompt
        # optional draft-model source (`runtime.draft.ModelDraftSource`):
        # needs NO extra broadcast — propose() is a deterministic function of
        # request histories (identical on every host from the admission
        # record + identical decode streams) through a replicated draft
        # engine, so every host computes the same drafts independently
        self.draft_source = draft_source
        self.is_host0 = jax.process_index() == 0
        self.queue: deque[Request] = deque()
        self.slot_to_request: Dict[int, Request] = {}
        self.stats = BatcherStats()
        # admission order, maintained identically on EVERY host (from the
        # broadcast record) so preemption picks the same victim everywhere
        self._admit_seq = 0
        self._admitted_at: Dict[int, int] = {}
        # chunked-prefill jobs: deterministic from the broadcast record (the
        # prompt is in the record; chunks advance FIFO one per tick), so
        # every host runs them in lockstep with no extra coordination
        self._prefilling: Dict[int, Request] = {}

    def submit(self, req: Request) -> None:
        """Requests are fed on host 0; other hosts receive them via broadcast."""
        if self.is_host0:
            self.queue.append(req)

    _REC_META = 12  # columns before the prompt
    _MAX_STOP = 4  # stop_token_ids carried in the record (cols 8..11)

    def _record_logprob(self, slot: int, req: Request) -> None:
        if req.logprobs:
            lps = self.engine.token_logprobs.get(slot)
            if lps:
                req.output_logprobs.append(lps.pop(0))

    def _admission_record(self) -> np.ndarray:
        """Fixed-shape [max_admits, 12 + max_prompt] int32 record:
        (slot, request_id, budget_left, eos, true_len,
         temp_fp, top_k, top_p_fp, stop_0..stop_3, prompt...)
        slot=-1 ⇒ empty row; eos=-1 ⇒ no EOS.  budget_left is the REMAINING
        token budget (max_new_tokens minus tokens already generated before a
        preemption) so shadow requests — which start with empty output_ids —
        retire on exactly the same tick as host 0's rich request.
        Per-request sampling rides as 1e-6 fixed point (temp_fp = -1 ⇒ no
        override); EVERY host — host 0 included — installs the DECODED
        values so fixed-point rounding can never diverge ranks."""
        rec = np.full((self.max_admits, self._REC_META + self.max_prompt), -1, np.int32)
        if self.is_host0:
            free = [s for s in self.engine.free_slots()
                    if s not in self.slot_to_request and s not in self._prefilling]
            # paged pools gate admission on free pages; pages are only
            # allocated at prefill time (in _apply_admissions), so account
            # for every admission IN THIS RECORD before checking the next
            pool = getattr(self.engine, "pool", None)
            chunk = getattr(self.engine.ecfg, "prefill_chunk", 0)
            pages_left = pool.free_pages if pool is not None else None
            for row, slot in enumerate(free[: self.max_admits]):
                if not self.queue:
                    break
                if pool is not None:
                    n = min(len(self.queue[0].prompt_ids), self.max_prompt)
                    if chunk and n > chunk:  # chunked: whole-prompt pages
                        need = pool.pages_needed(n)
                    else:
                        need = pool.pages_needed(self.engine._bucket(n))
                    if pages_left < need + 1:  # +1 page of decode headroom
                        break
                    pages_left -= need
                req = self.queue.popleft()
                ids = np.asarray(req.prompt_ids[: self.max_prompt], np.int32)
                rec[row, 0] = slot
                rec[row, 1] = req.request_id
                rec[row, 2] = req.max_new_tokens - len(req.output_ids)
                rec[row, 3] = -1 if req.eos_token_id is None else req.eos_token_id
                rec[row, 4] = len(ids)
                if req.sampling is not None:
                    rec[row, 5] = round(req.sampling.temperature * 1e6)
                    rec[row, 6] = req.sampling.top_k
                    rec[row, 7] = round(req.sampling.top_p * 1e6)
                stops = list(req.stop_token_ids or [])
                if len(stops) > self._MAX_STOP:
                    raise ValueError(
                        f"multihost record carries at most {self._MAX_STOP} "
                        f"stop_token_ids, got {len(stops)}")
                for si, st in enumerate(stops):
                    rec[row, 8 + si] = st
                m = self._REC_META
                rec[row, m : m + len(ids)] = ids
                # host 0 keeps the rich Request object
                self.slot_to_request[slot] = req
        return rec

    def _apply_admissions(self, rec: np.ndarray) -> None:
        """Prefill the record's admissions — identical programs everywhere.
        Consecutive same-bucket rows prefill TOGETHER (`Engine.prefill_batch`
        up to ecfg.max_prefill_batch); the grouping is a pure function of the
        broadcast record, so every host runs the same batched program."""
        rows = []
        for row in rec:
            slot = int(row[0])
            if slot < 0:
                continue
            true_len = int(row[4])
            m = self._REC_META
            prompt = row[m : m + true_len].tolist()
            sp = None
            if int(row[5]) >= 0:
                from .sampler import SamplingParams

                sp = SamplingParams(temperature=int(row[5]) / 1e6,
                                    top_k=int(row[6]),
                                    top_p=int(row[7]) / 1e6)
            stops = [int(t) for t in row[8:12] if int(t) >= 0] or None
            # every host installs the record-DECODED params (host 0 too: its
            # rich request may hold a value the fixed point rounded)
            self.engine.set_slot_sampling(slot, sp)
            if not self.is_host0:
                # non-host0 processes mirror with a shadow Request
                self.slot_to_request[slot] = Request(
                    request_id=int(row[1]), prompt_ids=prompt,
                    max_new_tokens=int(row[2]),
                    eos_token_id=None if int(row[3]) < 0 else int(row[3]),
                    sampling=sp, stop_token_ids=stops,
                )
            self._admitted_at[slot] = self._admit_seq
            self._admit_seq += 1
            chunk = getattr(self.engine.ecfg, "prefill_chunk", 0)
            if chunk and len(prompt) > chunk:
                # long prompt: every host starts the SAME chunked job (the
                # record carries the prompt; chunks advance FIFO in step())
                req = self.slot_to_request.pop(slot)
                self._prefilling[slot] = req
                self.engine.start_chunked_prefill(slot, prompt)
                continue
            rows.append((slot, prompt))
        max_k = max(1, getattr(self.engine.ecfg, "max_prefill_batch", 1))
        i = 0
        while i < len(rows):
            bucket = self.engine._bucket(len(rows[i][1]))
            group = [rows[i]]
            i += 1
            while (i < len(rows) and len(group) < max_k
                   and self.engine._bucket(len(rows[i][1])) == bucket):
                group.append(rows[i])
                i += 1
            firsts = self.engine.prefill_batch(group)
            for slot, _ in group:
                first = firsts[slot]
                self.stats.prefills += 1
                req = self.slot_to_request[slot]
                req.output_ids.append(first)
                self._record_logprob(slot, req)
                self.stats.generated_tokens += 1
                self._maybe_retire(slot, first)

    def _preempt_one(self) -> bool:
        """Recompute preemption under pool pressure (mirrors
        `ContinuousBatcher._preempt_one`).  The victim choice is a pure
        function of state that is identical on every host (admission order,
        prompt+output lengths, bucket table), so all processes release the
        same slot with no extra broadcast; only host 0 requeues the folded
        request — other hosts drop their shadow and re-mirror it when host 0
        re-admits it."""
        for slot in sorted(self.slot_to_request, key=lambda s: -self._admitted_at[s]):
            req = self.slot_to_request[slot]
            full = req.prompt_ids + req.output_ids
            if len(full) >= self.engine.ecfg.max_seq or len(full) > self.max_prompt:
                continue
            try:
                self.engine._bucket(len(full))
            except ValueError:
                continue
            del self.slot_to_request[slot]
            self.engine.release(slot)
            if self.is_host0:
                # fold + MOVE outputs (budget decremented) so the re-admitted
                # request's history and remaining budget match the fresh
                # shadows other hosts will mirror from the record
                req.prompt_ids = full
                req.max_new_tokens -= len(req.output_ids)
                req.preempted_output_ids = req.preempted_output_ids + req.output_ids
                req.output_ids = []
                req.preempted_output_logprobs = (req.preempted_output_logprobs
                                                 + req.output_logprobs)
                req.output_logprobs = []
                self.queue.appendleft(req)
            self.stats.preemptions += 1
            return True
        return False

    def _maybe_retire(self, slot: int, token: int, length=None) -> None:
        req = self.slot_to_request[slot]
        hit_eos = req.eos_token_id is not None and token == req.eos_token_id
        hit_stop = bool(req.stop_token_ids) and token in req.stop_token_ids
        cur = self.engine.lengths[slot] if length is None else length
        done = (
            hit_eos
            or hit_stop
            or len(req.output_ids) >= req.max_new_tokens
            or cur + 1 >= self.engine.ecfg.max_seq
        )
        if done:
            req.done = True
            if req.preempted_output_ids:  # host 0's rich request only
                req.output_ids = req.preempted_output_ids + req.output_ids
                req.output_logprobs = (req.preempted_output_logprobs
                                       + req.output_logprobs)
                req.preempted_output_logprobs = []
                req.max_new_tokens += len(req.preempted_output_ids)
                req.preempted_output_ids = []
            del self.slot_to_request[slot]
            self.engine.release(slot)

    def step(self) -> None:
        rec = _broadcast(self._admission_record())
        self._apply_admissions(rec)
        if self._prefilling:
            # advance ONE chunked job — FIFO over the (identical-everywhere)
            # insertion order, so every host enqueues the same chunk program
            slot = next(iter(self._prefilling))
            req = self._prefilling[slot]
            try:
                tok = self.engine.prefill_chunk_step(slot)
            except PoolExhausted:
                if not self._preempt_one():
                    raise
                return
            if tok is not None:
                del self._prefilling[slot]
                self.stats.prefills += 1
                self.slot_to_request[slot] = req
                req.output_ids.append(tok)
                self._record_logprob(slot, req)
                self.stats.generated_tokens += 1
                self._maybe_retire(slot, tok)
        if not self.slot_to_request:
            # idle engine (identical on every rank): if host 0's head request
            # still can't be admitted it never fits — fail loudly EVERYWHERE
            # (a host0-only raise would leave other ranks blocked in the next
            # broadcast).  slot_to_request emptiness gates the collective so
            # busy ticks pay nothing.
            stuck = 0
            if self.is_host0 and self.queue:
                req = self.queue[0]
                if not self.engine.can_admit(min(len(req.prompt_ids), self.max_prompt)):
                    stuck = req.request_id + 1
            stuck = int(_broadcast(np.asarray([stuck], np.int32))[0])
            if stuck:
                raise RuntimeError(
                    f"request {stuck - 1} cannot be admitted even with an "
                    "idle engine — page pool smaller than its bucket")
        gamma = getattr(self.engine.ecfg, "spec_gamma", 0)
        if gamma and self.slot_to_request:
            # drafts are a pure function of request histories, which are
            # identical on every host (prompt from the broadcast record,
            # outputs from identical decode streams) — no extra broadcast,
            # whether they come from prompt-lookup or a replicated draft
            # model (each host rolls its own identical draft engine).
            # Stochastic requests verify by rejection sampling with the
            # shared key/sampling vectors, so ranks stay byte-identical.
            from .batching import ContinuousBatcher

            if self.draft_source is not None:
                drafts = self.draft_source.propose(self, gamma)
            else:
                drafts = ContinuousBatcher._propose_drafts(self, gamma)
            if drafts is not None:
                try:
                    tok_lists = self.engine.spec_decode_step(drafts)
                except PoolExhausted:
                    if not self._preempt_one():
                        raise
                    return
                self.stats.decode_steps += 1
                for slot, toks in tok_lists.items():
                    req = self.slot_to_request.get(slot)
                    if req is None:
                        continue
                    self.stats.spec_drafted += gamma
                    self.stats.spec_accepted += len(toks) - 1
                    base_len = int(self.engine.lengths[slot]) - len(toks)
                    for idx, tok in enumerate(toks):
                        req.output_ids.append(tok)
                        self._record_logprob(slot, req)
                        self.stats.generated_tokens += 1
                        self._maybe_retire(slot, tok, length=base_len + idx + 1)
                        if req.done:
                            break
                return
        try:
            toks = self.engine.decode_step()
        except PoolExhausted:
            # deterministic on every host (pool state is identical); shed the
            # same victim everywhere and retry next tick
            if not self._preempt_one():
                raise
            return
        for slot, tok in toks.items():
            req = self.slot_to_request.get(slot)
            if req is None:
                continue
            req.output_ids.append(tok)
            self._record_logprob(slot, req)
            self.stats.generated_tokens += 1
            self._maybe_retire(slot, tok)
        self.stats.decode_steps += 1

    def pending(self) -> bool:
        """Any work left? Queue length must come from host 0's view."""
        local = np.asarray(
            [len(self.queue) + len(self.slot_to_request) + len(self._prefilling)],
            np.int32)
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
