"""Serial runner for every measurement queued on TPU-tunnel recovery.

The axon tunnel has been down since round-2 end; this script exists so ONE
command captures everything the moment it comes back (run it under a
generous `timeout`; it is safe to re-run — each item lands as a JSON line
in .onchip_queue_results.jsonl and completed items are skipped).

Priority order (highest first):
  1. headline  — bench.py 7B speedup-vs-acceptance curve (the number the
                 project is judged on; BENCH artifact insurance)
  2. gate      — scripts/kernel_gate.py compiled-kernel numerics
  3. int8      — 7B int8 AR after the post-contraction-scale reformulation
                 (ops/linear.py::_qdot; VERDICT r2 #4 target: >= ~90 tok/s)
  4. int4      — 7B int4 AR (groupwise int4; ideal ~2x int8's bytes saving)
  5. tree      — 7B tree-width sweep at mid acceptance (does multi-candidate
                 rescue low-acceptance rounds end-to-end?)

Each item runs in a subprocess with its own timeout so a hung tunnel call
cannot wedge the queue. TPU jobs are strictly serial (two concurrent TPU
processes contend and OOM each other — see .claude/skills/verify).
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(REPO, ".onchip_queue_results.jsonl")

ITEMS = [
    # (name, argv, timeout_s)
    ("headline_7b_curve",
     [sys.executable, "bench.py", "--config", "7b", "--single", "--curve",
      "--deadline", "0"],
     7200.0),
    ("kernel_gate",
     [sys.executable, "scripts/kernel_gate.py"],
     3600.0),
    ("int8_ar_7b",
     [sys.executable, "bench.py", "--config", "7b", "--single", "--no-curve",
      "--quant", "--max-steps", "256", "--repeats", "2"],
     5400.0),
    ("int8_ar_7b_prescale_ab",  # pre-round-3 formulation, for the delta
     [sys.executable, "bench.py", "--config", "7b", "--single", "--no-curve",
      "--quant", "--max-steps", "256", "--repeats", "2"],
     5400.0),
    ("int4_ar_7b",
     [sys.executable, "bench.py", "--config", "7b", "--single", "--no-curve",
      "--quant", "--quant-bits", "4", "--max-steps", "256", "--repeats", "2"],
     5400.0),
    ("tree3_7b_mid_acceptance",
     [sys.executable, "bench.py", "--config", "7b", "--single", "--no-curve",
      "--tree-width", "3", "--tail-eps", "0.6", "--max-steps", "256",
      "--repeats", "2"],
     5400.0),
    # --- round-3 second wave (after the r3 on-chip capture of 2026-08-19) ---
    # kernel_gate rerun: the quant-matmul oracle now runs precision='highest'
    # (commit 3799c1c) — the first run failed on oracle truncation, not the
    # kernel (max_abs_err 0.109 vs tol 0.05)
    ("kernel_gate_v2",
     [sys.executable, "scripts/kernel_gate.py"],
     3600.0),
    # int4 rerun after the nibble-packed uint8 representation (S4 cannot
    # cross a jit boundary on this backend) + split-K dequant formulation
    ("int4_ar_7b_v2",
     [sys.executable, "bench.py", "--config", "7b", "--single", "--no-curve",
      "--quant", "--quant-bits", "4", "--max-steps", "256", "--repeats", "2"],
     5400.0),
    # tree redo at honest mid acceptance: the first run used tail_eps=0.6,
    # which collapses acceptance to 0.003 (the curve maps 0.02->0.69,
    # 0.04->0.44) — measure where multi-candidate drafting plausibly pays
    ("tree3_7b_eps02",
     [sys.executable, "bench.py", "--config", "7b", "--single", "--no-curve",
      "--tree-width", "3", "--tail-eps", "0.02", "--max-steps", "256",
      "--repeats", "2"],
     5400.0),
    ("tree3_7b_eps04",
     [sys.executable, "bench.py", "--config", "7b", "--single", "--no-curve",
      "--tree-width", "3", "--tail-eps", "0.04", "--max-steps", "256",
      "--repeats", "2"],
     5400.0),
    ("linear_7b_eps04",  # linear-draft control for the tree A/B
     [sys.executable, "bench.py", "--config", "7b", "--single", "--no-curve",
      "--tail-eps", "0.04", "--max-steps", "256", "--repeats", "2"],
     5400.0),
    ("paged_tree_serving_1b",
     [sys.executable, "scripts/bench_serving.py", "--config", "1b",
      "--batch", "4", "--requests", "16", "--max-steps", "128",
      "--tree-width", "3", "--paged", "--kv-quant", "--skip-gather",
      "--skip-static"],
     3600.0),
    ("chunked_admission_stall_1b",
     [sys.executable, "scripts/bench_chunked.py", "--config", "1b",
      "--prompt-bucket", "1024", "--chunk", "128", "--long-prompt", "1024",
      "--max-steps", "96"],
     5400.0),
    # --- round-4 third wave ---
    # int4 e2e after the Pallas fused dequant-matmul kernel landed in the
    # decode dispatch (ops/linear.py::_use_pallas_i4mm; per-op 1.36 ms vs
    # XLA split-K 1.71 at 8x4096x11008 — prior e2e was 36.4 tok/s AR)
    ("int4_ar_7b_v3",
     [sys.executable, "bench.py", "--config", "7b", "--single", "--no-curve",
      "--quant", "--quant-bits", "4", "--max-steps", "256", "--repeats", "2"],
     5400.0),
    # int8 spec at the production operating point (acc ~0.8; the r3 int8
    # spec number was at acc 0.97 — not the honest operating point)
    ("int8_spec_7b_eps0124",
     [sys.executable, "bench.py", "--config", "7b", "--single", "--no-curve",
      "--quant", "--tail-eps", "0.0124", "--max-steps", "256",
      "--repeats", "2"],
     5400.0),
    # adaptive drafting A/B at the headline operating point (r4 plan (c)):
    # does confidence-gated draft exit beat fixed spec=6 at acc ~0.8?
    ("adaptive_ab_7b_headline",
     [sys.executable, "scripts/bench_adaptive.py", "--config", "7b",
      "--eps", "0.0124", "--taus", "0.0", "0.4", "0.7",
      "--max-steps", "256"],
     5400.0),
    # --- round-4 fourth wave: quantized drafter (draft int8, verify bf16;
    # greedy output bit-identical to bf16 AR). Draft steps dominate round
    # time at acc~0.8 (6 x E-layer passes per verify) — int8 drafts should
    # cut them ~2x for an expected headline ~2.25x -> ~2.8x.
    ("dq8_7b_eps0124",
     [sys.executable, "bench.py", "--config", "7b", "--single", "--no-curve",
      "--draft-quant", "8", "--tail-eps", "0.0124", "--max-steps", "256",
      "--repeats", "2"],
     5400.0),
    ("dq8_7b_ceiling",
     [sys.executable, "bench.py", "--config", "7b", "--single", "--no-curve",
      "--draft-quant", "8", "--max-steps", "256", "--repeats", "2"],
     5400.0),
    # --- round-4 fifth wave: drafter head precision A/B. The dq8 runs above
    # quantized the drafter's 32k-channel exit head too; acceptance fell
    # 0.98->0.73 at eps=0 (vs bf16 drafts), eating most of the bandwidth
    # win (138 vs 130 tok/s). Hypothesis: head argmax is the quantization-
    # noise-sensitive op — share the base bf16 head (draft_quant_head=0,
    # now the default; zero extra HBM) and acceptance should mostly
    # recover while drafts stay ~2x cheaper.
    # NOTE: the prior dq8_7b_* runs predate the knob and used a QUANTIZED
    # head (the then-hardwired behavior) — they are the head=1 leg.
    ("dq8h16_7b_ceiling",
     [sys.executable, "bench.py", "--config", "7b", "--single", "--no-curve",
      "--draft-quant", "8", "--draft-quant-head", "0",
      "--max-steps", "256", "--repeats", "2"],
     5400.0),
    ("dq8h16_7b_eps0124",
     [sys.executable, "bench.py", "--config", "7b", "--single", "--no-curve",
      "--draft-quant", "8", "--draft-quant-head", "0",
      "--tail-eps", "0.0124", "--max-steps", "256", "--repeats", "2"],
     5400.0),
    # cheaper drafts shift the optimal window length: sweep W at the honest
    # operating point (headline uses spec=6)
    ("dq8h16_7b_eps0124_spec8",
     [sys.executable, "bench.py", "--config", "7b", "--single", "--no-curve",
      "--draft-quant", "8", "--draft-quant-head", "0", "--spec", "8",
      "--tail-eps", "0.0124", "--max-steps", "256", "--repeats", "2"],
     5400.0),
    # --- round-4 sixth wave: the head A/B showed acceptance is IDENTICAL
    # (0.6392) with bf16 vs int8 head — the loss is in the quantized
    # LAYERS. mlp-only drafts keep attention bf16 so in-window draft KV is
    # exact; does acceptance recover enough to beat full-int8's 125.7?
    ("dq8mlp_7b_eps0124",
     [sys.executable, "bench.py", "--config", "7b", "--single", "--no-curve",
      "--draft-quant", "8", "--draft-quant-mlp", "1",
      "--tail-eps", "0.0124", "--max-steps", "256", "--repeats", "2"],
     5400.0),
    ("dq8mlp_7b_ceiling",
     [sys.executable, "bench.py", "--config", "7b", "--single", "--no-curve",
      "--draft-quant", "8", "--draft-quant-mlp", "1",
      "--max-steps", "256", "--repeats", "2"],
     5400.0),
    # the driver-headline dress rehearsal: full curve + the automatic dq8
    # point at the bisected acc~0.8 eps (bench.py --headline-dq default)
    ("headline_7b_curve_dq",
     [sys.executable, "bench.py", "--config", "7b", "--single", "--curve",
      "--deadline", "0"],
     7200.0),
    # int4 drafter at the honest point (compile is very long through the
    # tunnel — run LAST; its first attempt died to an outer wall-clock cap)
    ("dq4h16_7b_eps0124",
     [sys.executable, "bench.py", "--config", "7b", "--single", "--no-curve",
      "--draft-quant", "4", "--draft-quant-head", "0",
      "--tail-eps", "0.0124", "--max-steps", "256", "--repeats", "2"],
     5400.0),
    # --- round-5 wave ---
    # dq4 retry after the per-layer quantize fix (the whole-stack int4
    # quantize planned 16.05 GiB and OOM'd — see quant.py
    # _quantize_layer_slice; AOT now plans 13.44 GiB peak)
    ("dq4h16_7b_eps0124_v2",
     [sys.executable, "bench.py", "--config", "7b", "--single", "--no-curve",
      "--draft-quant", "4", "--draft-quant-head", "0",
      "--tail-eps", "0.0124", "--max-steps", "256", "--repeats", "2"],
     5400.0),
    # headline dress rehearsal with the honest dq labeling (VERDICT r4 #1:
    # the substituted metric is now named by the dq point's own acceptance)
    ("headline_7b_curve_r5",
     [sys.executable, "bench.py", "--config", "7b", "--single", "--curve",
      "--deadline", "0"],
     7200.0),
    # the reference's signature artifact (VERDICT r4 #2): exit x spec grid
    # at the headline operating eps, CSV + contour PDF committed in-tree
    ("sweep_7b_grid",
     [sys.executable, "scripts/sweep_7b_onchip.py"],
     7200.0),
]


def done_names():
    names = set()
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            for line in f:
                try:
                    d = json.loads(line)
                    if d.get("ok"):
                        names.add(d["name"])
                except Exception:
                    pass
    return names


def tunnel_alive(timeout_s=180.0) -> bool:
    sys.path.insert(0, REPO)
    from bench import _tunnel_alive  # one probe implementation, no drift

    return _tunnel_alive(timeout_s)


def main():
    if not tunnel_alive():
        print("[queue] tunnel dead (bounded probe failed); nothing to do")
        raise SystemExit(3)
    skip = done_names()
    for name, argv, tmo in ITEMS:
        if name in skip:
            print(f"[queue] {name}: already captured, skipping")
            continue
        print(f"[queue] {name}: running (timeout {tmo:.0f}s)")
        t0 = time.time()
        env = dict(os.environ)
        if name.endswith("_prescale_ab"):
            env["LAYERSKIP_INT8_PRESCALE"] = "1"
        try:
            r = subprocess.run(
                argv, cwd=REPO, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, timeout=tmo, env=env,
            )
            out = r.stdout.decode(errors="replace")
            # the bench/gate contract: last stdout line is one JSON object
            parsed = None
            for line in reversed(out.strip().splitlines()):
                try:
                    parsed = json.loads(line)
                    break
                except Exception:
                    continue
            rec = {"name": name, "ok": r.returncode == 0 and parsed is not None,
                   "rc": r.returncode, "elapsed_s": round(time.time() - t0, 1),
                   "result": parsed}
            if not rec["ok"]:
                rec["tail"] = out[-2000:]
        except subprocess.TimeoutExpired:
            rec = {"name": name, "ok": False, "rc": 124,
                   "elapsed_s": round(time.time() - t0, 1), "result": None}
        with open(RESULTS, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"[queue] {name}: ok={rec['ok']} rc={rec['rc']} "
              f"({rec['elapsed_s']}s)")
        if not rec["ok"] and not tunnel_alive():
            print("[queue] tunnel died mid-queue; stopping")
            raise SystemExit(3)
    print(f"[queue] done; results in {RESULTS}")


if __name__ == "__main__":
    main()
