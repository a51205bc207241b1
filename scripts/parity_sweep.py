"""One-command real-data parity sweep (VERDICT r2 item 4).

Runs the reference's benchmark matrix end-to-end — BASELINE.json configs[0]
(opt-125m magnitude), opt-1.3b hessian, the llama-7b low_frac sweep
(`/root/reference/gptq_pb/run_all.sh:2-5`), then QAT + eval
(`qat/eval_after_qat.py`) — and records every perplexity / effective-bits
number into BASELINE.md between `<!-- parity-sweep:begin/end -->` markers,
plus a JSONL metrics stream per step.

Two modes:

* **real** (default): needs HF weights + datasets (populated ``HF_HOME``).
  The moment the environment has caches, ``python scripts/parity_sweep.py``
  fills every TBD cell of BASELINE.md's quality table.
* **--synthetic**: the same sweep end-to-end on seeded synthetic
  models/corpora (CPU, offline) — the CI dry-run.  Asserts the pinned
  protocol goldens (`tests/test_cli.py::test_run_ptq_synthetic_golden_ppl`)
  still hold, so the sweep harness itself is regression-tested.

Usage:
    python scripts/parity_sweep.py [--synthetic] [--out outputs/parity]
        [--skip-qat] [--qat-steps N] [--fracs 0.5,0.8,0.9,0.95]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# the CI-pinned synthetic-protocol goldens (test_cli.py golden test)
SYNTHETIC_GOLDEN = {
    "wikitext2": 269.0968063188994,
    "ptb": 269.2145182145074,
    "c4": 268.6829047971141,
}

BEGIN = "<!-- parity-sweep:begin -->"
END = "<!-- parity-sweep:end -->"


def read_metrics(path):
    out = []
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    out.append(json.loads(line))
    return out


def ppls_from_metrics(events):
    return {e["dataset"]: e["ppl"] for e in events if e.get("event") == "ppl"}


def hf_cache_populated(model_ids) -> bool:
    """True when every needed model has a snapshot under the HF cache —
    the moment weights land, `python scripts/parity_sweep.py` fills the
    BASELINE.md table with no code changes (VERDICT r3 #6)."""
    hub = os.path.join(
        os.environ.get("HF_HOME", os.path.expanduser("~/.cache/huggingface")),
        "hub")
    for mid in model_ids:
        d = os.path.join(hub, "models--" + mid.replace("/", "--"), "snapshots")
        if not (os.path.isdir(d) and os.listdir(d)):
            return False
    return True


def run_ptq_step(tag, argv, out_dir, results, log, checkpoint=None):
    from pb_llm_tpu.cli import run_ptq

    metrics = os.path.join(out_dir, f"{tag}.jsonl")
    prior = ppls_from_metrics(read_metrics(metrics))
    if len(prior) >= 3:
        # per-config resume: a crashed sweep re-runs only unfinished steps
        log(f"[{tag}] already complete ({prior}); skipping (delete {metrics} to redo)")
        results[tag] = {"ppl": prior, "seconds": 0.0}
        return prior
    if os.path.exists(metrics):
        os.remove(metrics)  # partial run: redo cleanly
    argv = argv + ["--metrics", metrics]
    log(f"[{tag}] run_ptq {' '.join(argv)}")
    t0 = time.time()
    rc = run_ptq.main(argv)
    if rc != 0:
        raise RuntimeError(f"{tag}: run_ptq exited {rc}")
    ppls = ppls_from_metrics(read_metrics(metrics))
    results[tag] = {"ppl": ppls, "seconds": round(time.time() - t0, 1)}
    log(f"[{tag}] ppl: {ppls}")
    if checkpoint is not None:
        checkpoint()  # BASELINE.md row lands the moment the step finishes
    return ppls


def update_baseline_md(path, results, synthetic):
    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    mode = "SYNTHETIC dry-run (CI harness check)" if synthetic else "real weights/data"
    lines = [BEGIN,
             f"## Parity sweep results — {mode} ({stamp})",
             "",
             "Produced by `python scripts/parity_sweep.py"
             + (" --synthetic" if synthetic else "") + "`.",
             "",
             "| Step | wikitext2 | ptb | c4 | extra |"]
    lines.append("|---|---|---|---|---|")
    for tag, r in results.items():
        ppl = r.get("ppl", {})
        extra = {k: v for k, v in r.items() if k not in ("ppl", "seconds")}
        lines.append(
            "| {} | {} | {} | {} | {} |".format(
                tag,
                *(f"{ppl[d]:.4f}" if d in ppl else "—" for d in ("wikitext2", "ptb", "c4")),
                "; ".join(f"{k}={v}" for k, v in extra.items()) or "—",
            ))
    lines.append(END)
    block = "\n".join(lines)
    text = open(path).read() if os.path.exists(path) else "# BASELINE\n"
    if BEGIN in text and END in text:
        pre = text[: text.index(BEGIN)]
        post = text[text.index(END) + len(END):]
        text = pre + block + post
    else:
        text = text.rstrip("\n") + "\n\n" + block + "\n"
    with open(path, "w") as f:
        f.write(text)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--out", type=str, default="outputs/parity")
    ap.add_argument("--baseline_md", type=str, default=os.path.join(REPO, "BASELINE.md"))
    ap.add_argument("--fracs", type=str, default="0.5,0.8,0.9,0.95",
                    help="llama-7b low_frac sweep values")
    ap.add_argument("--nsamples", type=int, default=None,
                    help="calibration windows (default: 128 real / 2 synthetic)")
    ap.add_argument("--skip-qat", action="store_true")
    ap.add_argument("--skip-opt13b", action="store_true")
    ap.add_argument("--skip-llama", action="store_true")
    ap.add_argument("--qat_steps", type=int, default=None,
                    help="QAT fine-tune steps (default: 10000 real / 2 synthetic)")
    args = ap.parse_args(argv)

    def log(m):
        print(m, flush=True)

    if not args.synthetic:
        needed = ["facebook/opt-125m"]
        if not args.skip_opt13b or not args.skip_qat:
            needed.append("facebook/opt-1.3b")
        if not args.skip_llama:
            needed.append("huggyllama/llama-7b")
        if not hf_cache_populated(needed):
            log("HF cache is NOT populated for: " + ", ".join(needed))
            log("(checked $HF_HOME/hub; this offline image has no weights)")
            log("Run with --synthetic for the CI dry-run, or populate the "
                "cache and re-run — the sweep resumes per config and writes "
                "BASELINE.md rows incrementally.")
            return 2

    os.makedirs(args.out, exist_ok=True)
    syn = ["--synthetic"] if args.synthetic else []
    nsamples = args.nsamples or (2 if args.synthetic else 128)
    qat_steps = args.qat_steps or (2 if args.synthetic else 10000)
    results: dict = {}

    def checkpoint():
        update_baseline_md(args.baseline_md, results, args.synthetic)

    # -- configs[0]: opt-125m magnitude, the CPU-runnable minimum slice -----
    ppls = run_ptq_step(
        "opt125m_w2_xnor_0.5_magnitude",
        ["facebook/opt-125m", "wikitext2", "xnor", "--low_frac", "0.5",
         "--high_bit", "8", "--salient_metric", "magnitude",
         "--nsamples", str(nsamples), "--format", "packed_v2"] + syn,
        args.out, results, log, checkpoint)
    if args.synthetic:
        for ds, want in SYNTHETIC_GOLDEN.items():
            got = ppls[ds]
            if abs(got - want) / want > 5e-4:
                raise AssertionError(
                    f"synthetic-protocol golden drifted: {ds} {got} != {want}")
        log("synthetic goldens hold (protocol unchanged)")
        results["opt125m_w2_xnor_0.5_magnitude"]["goldens"] = "hold"

    # -- configs[1]: opt-1.3b hessian --------------------------------------
    if not args.skip_opt13b:
        run_ptq_step(
            "opt13b_c4_xnor_0.8_hessian",
            [("facebook/opt-125m" if args.synthetic else "facebook/opt-1.3b"),
             "c4", "xnor", "--low_frac", "0.8", "--high_bit", "8",
             "--salient_metric", "hessian", "--nsamples", str(nsamples),
             "--format", "packed_v2"] + syn,
            args.out, results, log, checkpoint)

    # -- configs[2]: llama-7b hessian sweep (reference run_all.sh:2-5) ------
    mask_for_qat = None
    if not args.skip_llama:
        model = "huggyllama/llama-7b"
        for frac in args.fracs.split(","):
            frac = frac.strip()
            mask = os.path.join(args.out, f"masks_llama7b_{frac}.npz")
            run_ptq_step(
                f"llama7b_c4_xnor_{frac}_hessian",
                [model, "c4", "xnor", "--low_frac", frac, "--high_bit", "8",
                 "--salient_metric", "hessian", "--nsamples", str(nsamples),
                 "--format", "packed_v2", "--mask_out", mask,
                 "--save_pbw", os.path.join(args.out, f"pbw_llama7b_{frac}")] + syn,
                args.out, results, log, checkpoint)
            if frac == "0.9":
                mask_for_qat = mask

    # -- configs[3]: QAT then eval (reference eval_after_qat.py) ------------
    if not args.skip_qat:
        from pb_llm_tpu.cli import run_eval, run_qat

        qat_model = "facebook/opt-125m" if args.synthetic else "facebook/opt-1.3b"
        qat_out = os.path.join(args.out, "qat")
        qmetrics = os.path.join(args.out, "qat.jsonl")
        qargv = ["--model_id", qat_model, "--binarization_method", "xnor_outlier",
                 "--outlier_fraction", "0.1", "--train_steps", str(qat_steps),
                 "--dataset", ("Abirate/english_quotes" if args.synthetic else "red_pajama"),
                 "--out_dir", qat_out, "--metrics", qmetrics] + syn
        log(f"[qat] run_qat {' '.join(qargv)}")
        rc = run_qat.main(qargv)
        if rc != 0:
            raise RuntimeError(f"run_qat exited {rc}")
        bits = [e for e in read_metrics(qmetrics) if e.get("event") == "mean_bits"]
        results["qat_xnor_outlier_0.1"] = {
            "effective_bits": bits[-1].get("bits") if bits else None}

        # eval the saved checkpoint: ppl always; tasks only online
        ckpt = os.path.join(qat_out, qat_model, f"xnor_outlier_0.1_{qat_steps}")
        if os.path.isdir(ckpt):
            emetrics = os.path.join(args.out, "qat_eval.jsonl")
            eargv = [ckpt, "--model_id", qat_model,
                     "--eval_ppl", "wikitext2,ptb,c4", "--metrics", emetrics] + syn
            if not args.synthetic:
                eargv += ["--tasks", "boolq,piqa", "--limit", "200"]
            log(f"[qat_eval] run_eval {' '.join(eargv)}")
            rc = run_eval.main(eargv)
            if rc != 0:
                raise RuntimeError(f"run_eval exited {rc}")
            ev = read_metrics(emetrics)
            results["qat_xnor_outlier_0.1"]["ppl"] = ppls_from_metrics(ev)
            accs = {e["task"]: e["acc"] for e in ev if e.get("event") == "task"}
            if accs:
                results["qat_xnor_outlier_0.1"]["acc"] = accs

    update_baseline_md(args.baseline_md, results, args.synthetic)
    with open(os.path.join(args.out, "parity_results.json"), "w") as f:
        json.dump(results, f, indent=1)
    log(f"BASELINE.md updated; full results in {args.out}/parity_results.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
