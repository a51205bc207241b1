"""Continuous batching scheduler on top of `runtime.engine.Engine`.

Host-side loop: admit queued requests into free slots (prefill), then run
batched decode steps over the full pool; requests retire on EOS or their
token budget, freeing their slot for the next queued request mid-stream —
no "wait for the whole batch" barrier.  This is the serving layer the
reference lacks entirely (BASELINE.json north star: continuous batching
across hosts; the multi-host variant broadcasts admissions from host 0 over
DCN — see `parallel.mesh.multihost_initialize`).

With `EngineConfig.spec_gamma > 0` (greedy sampling, strip caches) the
decode tick runs SPECULATIVELY: each slot drafts γ tokens by prompt lookup
(the longest recent n-gram match in its own prompt+output history — no
draft model), and one verify forward accepts the exact-greedy prefix.
Decode is weight-stream-bound, so every extra accepted token is nearly
free; wrong drafts cost only the wasted verify FLOPs, never correctness.
"""

from __future__ import annotations

import dataclasses
import time
from collections import deque
from typing import Dict, List, Optional, Sequence

from .engine import Engine, PoolExhausted


@dataclasses.dataclass
class Request:
    request_id: int
    prompt_ids: List[int]
    max_new_tokens: int = 64
    eos_token_id: Optional[int] = None
    # per-request sampling override (None -> the engine's SamplingParams).
    # Greedy requests batch with sampled ones in one decode program, and
    # speculative ticks keep running: stochastic requests verify drafts by
    # rejection sampling (distribution-equal to plain sampling) while greedy
    # rows in the same window stay exact-greedy (engine.spec_decode_step).
    sampling: Optional[object] = None
    # extra stop tokens (beyond eos_token_id): the request retires when any
    # of them is emitted (the stop token IS included in the output, like eos)
    stop_token_ids: Optional[List[int]] = None
    # request per-token logprobs: filled into output_logprobs (every decode
    # program computes them anyway; this only controls recording)
    logprobs: bool = False
    output_logprobs: List[float] = dataclasses.field(default_factory=list)
    preempted_output_logprobs: List[float] = dataclasses.field(default_factory=list)
    # filled during serving
    output_ids: List[int] = dataclasses.field(default_factory=list)
    # tokens generated BEFORE a recompute-preemption: they were folded into
    # prompt_ids (and max_new_tokens decremented) so the request's history
    # and remaining budget look identical on every host; merged back into
    # output_ids at retirement so callers see the full stream
    preempted_output_ids: List[int] = dataclasses.field(default_factory=list)
    done: bool = False
    # host-side streaming hook: called with each generated token as it is
    # emitted (scheduler thread — keep it non-blocking).  Never broadcast.
    on_token: Optional[object] = dataclasses.field(
        default=None, repr=False, compare=False)


@dataclasses.dataclass
class BatcherStats:
    generated_tokens: int = 0
    decode_steps: int = 0
    prefills: int = 0
    preemptions: int = 0
    spec_drafted: int = 0   # draft tokens verified
    spec_accepted: int = 0  # draft tokens accepted (exact-greedy matches)
    wall_seconds: float = 0.0

    @property
    def tokens_per_second(self) -> float:
        return self.generated_tokens / self.wall_seconds if self.wall_seconds else 0.0


class ContinuousBatcher:
    def __init__(self, engine: Engine, draft_source=None):
        """``draft_source``: optional object with
        ``propose(batcher, gamma) -> Optional[np.ndarray]`` replacing the
        built-in prompt-lookup drafts (see `runtime.draft.ModelDraftSource`).
        Only consulted when ``engine.ecfg.spec_gamma > 0``."""
        self.engine = engine
        self.draft_source = draft_source
        self.queue: deque[Request] = deque()
        self.slot_to_request: Dict[int, Request] = {}
        self.stats = BatcherStats()
        self._admit_seq = 0
        self._admitted_at: Dict[int, int] = {}
        # chunked-prefill jobs in flight: slot -> Request (not yet decoding)
        self._prefilling: Dict[int, Request] = {}

    def submit(self, req: Request) -> None:
        self.queue.append(req)

    def _admit(self) -> None:
        """Admit queued requests into free slots.  Consecutive same-bucket
        requests prefill TOGETHER in one program (`Engine.prefill_batch`,
        up to ecfg.max_prefill_batch): m = K·bucket amortizes the packed
        prefill path's per-layer weight dequant K-fold."""
        chunk = getattr(self.engine.ecfg, "prefill_chunk", 0)
        while True:
            free = [s for s in self.engine.free_slots() if s not in self._prefilling]
            max_k = max(1, getattr(self.engine.ecfg, "max_prefill_batch", 1))
            batch, reserved, bucket = [], 0, None
            while free and self.queue and len(batch) < max_k:
                req = self.queue[0]
                if chunk and len(req.prompt_ids) > chunk:
                    # long prompt: claim the slot and prefill it one chunk
                    # per tick (step interleaves decode between chunks).
                    # No bucket applies — gate on (and reserve) the pages for
                    # the WHOLE prompt so chunks can't exhaust the pool that
                    # this tick's co-admissions were promised
                    pool = self.engine.pool
                    if pool is not None:
                        need = pool.pages_needed(len(req.prompt_ids))
                        if pool.free_pages - reserved < need + 1:
                            break
                        reserved += need
                    self.queue.popleft()
                    slot = free.pop(0)
                    self.engine.set_slot_sampling(slot, req.sampling)
                    self.engine.start_chunked_prefill(slot, req.prompt_ids)
                    self._prefilling[slot] = req
                    continue
                if not self.engine.can_admit(len(req.prompt_ids), reserved_pages=reserved):
                    break  # paged pool full: wait for a retirement to free pages
                b = self.engine._bucket(len(req.prompt_ids))
                if bucket is None:
                    bucket = b
                elif b != bucket:
                    break  # next request pads to a different bucket: next round
                if self.engine.pool is not None:
                    reserved += self.engine.pool.pages_needed(bucket)
                self.queue.popleft()
                batch.append((free.pop(0), req))
            if not batch:
                return
            for s_, r_ in batch:
                self.engine.set_slot_sampling(s_, r_.sampling)
            firsts = self.engine.prefill_batch([(s, r.prompt_ids) for s, r in batch])
            for slot, req in batch:
                self.stats.prefills += 1
                self.slot_to_request[slot] = req
                self._admitted_at[slot] = self._admit_seq
                self._admit_seq += 1
                self._emit(slot, req, firsts[slot])

    def _preempt_one(self) -> bool:
        """Paged-pool pressure valve (vLLM-style recompute preemption): evict
        the MOST RECENTLY admitted runnable request — release its pages, fold
        its generated tokens into the prompt, and requeue it at the FRONT so
        it resumes as soon as pages free up.  Greedy streams are unchanged by
        the recompute (same logits → same argmax); stochastic sampling yields
        a different but equally valid continuation.  Returns False when no
        victim can be recomputed (its grown prompt no longer fits a bucket).

        The folded tokens MOVE from output_ids to preempted_output_ids and
        the budget is decremented — prompt+output never double-counts the
        pre-preemption tokens (re-checks, drafts and non-host0 shadows all
        see the same history); `_maybe_retire` merges them back."""
        chunk = getattr(self.engine.ecfg, "prefill_chunk", 0)
        for slot in sorted(self.slot_to_request, key=lambda s: -self._admitted_at[s]):
            req = self.slot_to_request[slot]
            full = req.prompt_ids + req.output_ids
            if len(full) >= self.engine.ecfg.max_seq:
                continue
            if not (chunk and len(full) > chunk):
                # no chunked path for it: the grown prompt must fit a bucket
                try:
                    self.engine._bucket(len(full))
                except ValueError:
                    continue
            req.prompt_ids = full
            req.max_new_tokens -= len(req.output_ids)
            req.preempted_output_ids = req.preempted_output_ids + req.output_ids
            req.output_ids = []
            req.preempted_output_logprobs = (req.preempted_output_logprobs
                                             + req.output_logprobs)
            req.output_logprobs = []
            del self.slot_to_request[slot]
            self.engine.release(slot)
            self.queue.appendleft(req)
            self.stats.preemptions += 1
            return True
        return False

    def _emit(self, slot: int, req: Request, token: int,
              length: Optional[int] = None) -> None:
        """Append one generated token: stats, streaming callback, retirement."""
        req.output_ids.append(token)
        if req.logprobs:
            lps = self.engine.token_logprobs.get(slot)
            if lps:
                req.output_logprobs.append(lps.pop(0))
        self.stats.generated_tokens += 1
        if req.on_token is not None:
            req.on_token(token)
        self._maybe_retire(slot, token, length=length)

    def _maybe_retire(self, slot: int, token: int, length: Optional[int] = None) -> None:
        """``length``: the slot's sequence length AS OF this token — the
        speculative path emits several tokens per engine step and must judge
        each against its own position, not the window's final length."""
        req = self.slot_to_request[slot]
        hit_eos = req.eos_token_id is not None and token == req.eos_token_id
        hit_stop = bool(req.stop_token_ids) and token in req.stop_token_ids
        out_of_budget = len(req.output_ids) >= req.max_new_tokens
        cur = self.engine.lengths[slot] if length is None else length
        out_of_cache = cur + 1 >= self.engine.ecfg.max_seq
        if hit_eos or hit_stop or out_of_budget or out_of_cache:
            req.done = True
            if req.preempted_output_ids:  # merge recompute-preempted tokens back
                req.output_ids = req.preempted_output_ids + req.output_ids
                req.output_logprobs = (req.preempted_output_logprobs
                                       + req.output_logprobs)
                req.preempted_output_logprobs = []
                req.max_new_tokens += len(req.preempted_output_ids)
                req.preempted_output_ids = []
            del self.slot_to_request[slot]
            self.engine.release(slot)

    def _propose_drafts(self, gamma: int):
        """Prompt-lookup drafts [n_slots, γ] (or None to fall back to plain
        decode this tick): for each active slot, find the most recent earlier
        occurrence of its trailing n-gram (n = 3, 2) in prompt+output history
        and propose the tokens that followed it.  Slots near max_seq force
        the fallback (the verify program writes γ+1 rows unconditionally)."""
        import numpy as np

        eng = self.engine
        drafts = np.zeros((eng.ecfg.n_slots, gamma), np.int32)
        for slot, req in self.slot_to_request.items():
            if eng.lengths[slot] + gamma + 1 >= eng.ecfg.max_seq:
                return None
            hist = req.prompt_ids + req.output_ids
            # bound the host-side work per tick: only the most recent window
            # is scanned (recency predicts continuation best anyway; a full
            # scan would be O(history) Python per slot per decode tick)
            lo = max(0, len(hist) - 512)
            for n in (3, 2):
                if len(hist) <= n:
                    continue
                key = hist[-n:]
                # scan backwards over earlier positions for the n-gram
                found = False
                for j in range(len(hist) - n - 1, lo - 1, -1):
                    if hist[j : j + n] == key:
                        cont = hist[j + n : j + n + gamma]
                        drafts[slot, : len(cont)] = cont
                        if cont:
                            drafts[slot, len(cont):] = cont[-1]
                        found = True
                        break
                if found:
                    break
        return drafts

    def step(self) -> None:
        """One scheduler tick: admit new work, advance ONE chunked-prefill
        job (if any), then one batched decode step — long prompts no longer
        block running requests' decode."""
        self._admit()
        if self._prefilling:
            slot = next(iter(self._prefilling))  # FIFO (dict insertion order)
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
                self._admitted_at[slot] = self._admit_seq
                self._admit_seq += 1
                self._emit(slot, req, tok)
        if self.queue and not self.slot_to_request and not self._prefilling:
            # nothing running and the head request still can't be admitted:
            # it can never fit (pool smaller than its footprint) — fail
            # loudly instead of spinning forever
            req = self.queue[0]
            n = len(req.prompt_ids)
            chunk = getattr(self.engine.ecfg, "prefill_chunk", 0)
            pool = self.engine.pool
            if chunk and n > chunk:
                ok = pool is None or pool.free_pages >= pool.pages_needed(n) + 1
            else:
                ok = self.engine.can_admit(n)
            if not ok:
                raise RuntimeError(
                    f"request {req.request_id} (prompt {n}) cannot be "
                    "admitted even with an idle engine — page pool smaller "
                    "than its footprint")
        gamma = getattr(self.engine.ecfg, "spec_gamma", 0)
        if gamma and self.slot_to_request:
            if self.draft_source is not None:
                drafts = self.draft_source.propose(self, gamma)
            else:
                drafts = self._propose_drafts(gamma)
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
                    # engine.lengths already advanced by the whole window:
                    # judge each token at ITS position, not the final one
                    base_len = int(self.engine.lengths[slot]) - len(toks)
                    for idx, tok in enumerate(toks):
                        self._emit(slot, req, tok, length=base_len + idx + 1)
                        if req.done:
                            break  # tokens past EOS/budget are discarded
                return
        try:
            toks = self.engine.decode_step()
        except PoolExhausted:
            # the pool can't cover every active slot's next token: shed load
            # and retry next tick (the freed pages unblock the others)
            if not self._preempt_one():
                raise
            return
        for slot, tok in toks.items():
            req = self.slot_to_request.get(slot)
            if req is None:
                continue
            self._emit(slot, req, tok)
        self.stats.decode_steps += 1

    def run(self, requests: Sequence[Request]) -> List[Request]:
        """Serve all requests to completion; returns them with outputs."""
        for r in requests:
            self.submit(r)
        t0 = time.time()
        while self.queue or self.slot_to_request or self._prefilling:
            self.step()
        self.stats.wall_seconds += time.time() - t0
        return list(requests)
