"""Draft-model speculative decoding (scheduler-pluggable draft sources).

`ContinuousBatcher` verifies γ draft tokens per engine step
(`Engine.spec_decode_step`) — greedy-exact regardless of where the drafts
come from.  The built-in source is prompt-lookup (`batching._propose_drafts`:
n-gram continuation from the request's own history), which is free but only
fires on repetitive text.  This module adds the standard serving alternative:
a small *draft model* running its own engine proposes the γ tokens, lifting
acceptance on text with no self-repeats (ROADMAP item 12).

Correctness does not depend on the draft: wrong drafts cost only the wasted
verify FLOPs, and the emitted stream is provably identical to plain greedy
decode (see tests/test_spec_decode.py).  The draft model therefore needs no
quality guarantee — a 4-layer distilled model, an aggressively quantized PBW
of the target, or even a different tokenizer-compatible model all work.

Sync protocol (all host-side integers; the draft engine's caches are only
ever written through its own prefill/decode steps):
- admission is LAZY: the first `propose()` that sees a slot prefills the
  draft engine with that request's history — this also covers slots that
  arrive via chunked prefill or recompute-preemption re-admission.
- after a verify step accepted k ≤ γ tokens, the draft's cache rows past
  the accepted prefix hold its own (rejected) continuations — but rows at
  positions ≤ L+k hold exactly the accepted stream, so rollback is just
  `lengths[slot] = new_target_length` (strip rows past the length are
  overwritten in place, same invariant the target engine itself relies on).
- ticks the scheduler ran WITHOUT this source (temperature fallback, slots
  near max_seq) leave the draft behind; `propose()` catches it up by
  force-feeding the missed history tokens through batched decode steps.

Reference counterpart: none (the reference has no serving path, SURVEY §3.5).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from .engine import Engine


class ModelDraftSource:
    """Propose γ tokens per active slot by rolling a small draft engine.

    ``draft``: an `Engine` over the draft model.  Must share the target's
    ``n_slots`` and ``max_seq`` (slot ids are reused verbatim) and use strip
    caches (the draft is small — paging it buys nothing) and greedy sampling.
    """

    def __init__(self, draft: Engine):
        if draft.sampling.temperature != 0.0:
            raise ValueError("draft engine must sample greedily")
        if draft.pool is not None:
            raise ValueError("draft engine must use strip caches")
        mpe = getattr(draft.cfg, "max_position_embeddings", None)
        if mpe and mpe < draft.ecfg.max_seq:
            # past the draft's position table JAX clamps the gather —
            # garbage drafts with no error; fail at construction instead
            raise ValueError(
                f"draft model max_position_embeddings {mpe} < engine "
                f"max_seq {draft.ecfg.max_seq}: drafts past position {mpe} "
                "would silently degenerate")
        self.draft = draft
        # which request each draft slot was prefilled for: a slot can be
        # retired AND re-admitted to a new request between two propose()
        # calls (the batcher admits before the decode tick), and the stale
        # KV would otherwise be silently reused for the new request
        self._slot_request: Dict[int, object] = {}

    def propose(self, batcher, gamma: int) -> Optional[np.ndarray]:
        """Drafts [n_slots, γ] for the batcher's active slots, or None to
        fall back to plain decode this tick (same contract as the batcher's
        prompt-lookup `_propose_drafts`)."""
        target = batcher.engine
        slots: Dict[int, object] = batcher.slot_to_request
        d = self.draft
        if d.ecfg.n_slots != target.ecfg.n_slots:
            raise ValueError("draft n_slots must match the target engine")
        for slot, req in slots.items():
            if target.lengths[slot] + gamma + 1 >= target.ecfg.max_seq:
                return None  # verify writes γ+1 rows unconditionally
            if target.lengths[slot] + gamma + 1 >= d.ecfg.max_seq:
                return None

        # drop slots the batcher retired/preempted since the last tick, and
        # slots REUSED for a different request (retire + re-admit can both
        # happen between two propose() calls — the old KV must not leak)
        for s in range(d.ecfg.n_slots):
            if d.active[s] and (s not in slots
                                or self._slot_request.get(s) is not slots[s]):
                d.release(s)
                self._slot_request.pop(s, None)

        hists = {}
        for slot, req in slots.items():
            hist = list(req.prompt_ids) + list(req.output_ids)
            hists[slot] = hist
            lt = len(hist) - 1  # target cache rows hold hist[:lt]
            if not d.active[slot]:
                d.prefill(slot, hist[:lt])
                self._slot_request[slot] = req
            elif d.lengths[slot] > lt:
                # verify-step rollback: rows ≤ lt hold the accepted stream
                d.lengths[slot] = lt

        # catch-up: feed history tokens the draft never consumed (ticks run
        # without this source).  Each batched step advances every behind
        # slot by one forced token; synced slots are parked inactive (their
        # garbage row lands at ≥ their length and is overwritten later —
        # the engines' standard inactive-slot invariant).
        while True:
            behind = [s for s in slots if d.lengths[s] < len(hists[s]) - 1]
            if not behind:
                break
            act = np.zeros(d.ecfg.n_slots, bool)
            for s in behind:
                act[s] = True
                d.last_token[s] = hists[s][int(d.lengths[s])]
            d.active = act
            d.decode_step()

        act = np.zeros(d.ecfg.n_slots, bool)
        for s in slots:
            act[s] = True
            d.last_token[s] = hists[s][-1]
        d.active = act

        drafts = np.zeros((target.ecfg.n_slots, gamma), np.int32)
        for j in range(gamma):
            toks = d.decode_step()
            for s, t in toks.items():
                drafts[s, j] = t
        return drafts
