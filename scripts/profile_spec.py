"""Capture a jax.profiler trace of spec vs AR generation and summarize op time.

Usage: python scripts/profile_spec.py [--config 1b] [--mode spec|ar]
Writes the trace under /tmp/lsk_trace and prints the top ops by self time,
parsed straight from the perfetto .trace.json.gz (no UI needed).
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="1b")
    ap.add_argument("--mode", default="spec", choices=["spec", "ar"])
    ap.add_argument("--max-steps", type=int, default=64)
    ap.add_argument("--spec", type=int, default=6)
    ap.add_argument("--quant", action="store_true",
                    help="int8 weight-only params (the VERDICT r2 #4 "
                         "roofline-gap target)")
    ap.add_argument("--tree-width", type=int, default=0,
                    help="profile multi-candidate (tree) speculation")
    ap.add_argument("--tail-eps", type=float, default=0.0,
                    help="acceptance dial (bench.py semantics)")
    ap.add_argument("--logdir", default="/tmp/lsk_trace")
    args = ap.parse_args()

    from bench import build_config, make_param_builder
    from layerskip_tpu.config import GenerationConfig
    from layerskip_tpu.generation.engine import Engine, postprocess_output

    cfg = build_config(args.config)
    params = make_param_builder(cfg, 8, quant=args.quant)(
        jax.random.PRNGKey(0), args.tail_eps)
    eng = Engine(params, cfg)
    prompt = list(range(5, 37))
    if args.mode == "spec":
        gen_cfg = GenerationConfig(
            generation_strategy="self_speculative", exit_layer=8,
            num_speculations=args.spec, max_steps=args.max_steps, sample=False,
            spec_tree_width=args.tree_width,
        )
    else:
        gen_cfg = GenerationConfig(
            generation_strategy="autoregressive", exit_layer=-1,
            max_steps=args.max_steps, sample=False,
        )

    # compile outside the trace
    out = eng.generate(prompt, gen_cfg, jax.random.PRNGKey(0))
    np.asarray(out.tokens)

    jax.profiler.start_trace(args.logdir)
    t0 = time.time()
    out = eng.generate(prompt, gen_cfg, jax.random.PRNGKey(1))
    toks = postprocess_output(out, (), gen_cfg.max_steps)
    dt = time.time() - t0
    jax.profiler.stop_trace()
    print(f"{args.mode}: {len(toks)} toks in {dt:.3f}s = {len(toks)/dt:.1f} tok/s")

    traces = sorted(
        glob.glob(os.path.join(args.logdir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not traces:
        print("no trace file found")
        return
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # aggregate complete events by name on device tracks
    agg = {}
    for ev in events:
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "?")
        dur = ev.get("dur", 0)  # microseconds
        agg[name] = agg.get(name, 0) + dur
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
    total = sum(agg.values())
    print(f"\ntotal traced op-us: {total}")
    for name, us in top:
        print(f"{us/1e3:10.2f} ms  {us/max(total,1)*100:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
