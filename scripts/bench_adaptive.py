"""Adaptive-drafting benchmark: spec tok/s vs draft_exit_prob at fixed
acceptance operating points.

Builds the bench model once (traced tail_eps dials acceptance, see
bench.py) and measures the self-speculative rate for each (tail_eps, tau)
pair plus the AR baseline. Prints one JSON line.

Usage: python scripts/bench_adaptive.py [--config 7b] [--eps 0.021 0.05]
       [--taus 0 0.4 0.7] [--max-steps 512]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="7b")
    ap.add_argument("--exit-layer", type=int, default=8)
    ap.add_argument("--spec", type=int, default=6)
    ap.add_argument("--max-steps", type=int, default=512)
    ap.add_argument("--prompt-len", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--eps", type=float, nargs="+", default=[0.021, 0.05])
    ap.add_argument("--taus", type=float, nargs="+", default=[0.0, 0.4, 0.7])
    args = ap.parse_args()

    import jax
    import numpy as np

    from bench import build_config, make_param_builder
    from layerskip_tpu.config import GenerationConfig
    from layerskip_tpu.generation.engine import Engine, postprocess_output

    cfg = build_config(args.config)
    exit_layer = min(args.exit_layer, max(cfg.num_hidden_layers // 2, 1))
    builder = make_param_builder(cfg, exit_layer)
    engine = Engine(builder(jax.random.PRNGKey(0), args.eps[0]), cfg)
    prompt = list(range(5, 5 + args.prompt_len))

    def timed(gen_cfg):
        out = engine.generate(prompt, gen_cfg, jax.random.PRNGKey(0))
        np.asarray(out.tokens)  # compile+warm (D2H anchors timing)
        best = 0.0
        for i in range(args.repeats):
            t0 = time.time()
            out = engine.generate(prompt, gen_cfg, jax.random.PRNGKey(i))
            toks = postprocess_output(out, (), gen_cfg.max_steps)
            dt = time.time() - t0
            best = max(best, len(toks) / dt)
        acc = float(int(out.matches)) / max(int(out.drafts), 1)
        return best, acc, int(out.drafts)

    ar_tps, _, _ = timed(GenerationConfig(
        max_steps=args.max_steps, sample=False,
        generation_strategy="autoregressive"))
    print(f"[adaptive] AR {ar_tps:.1f} tok/s", file=sys.stderr)

    import gc

    points = []
    for eps in args.eps:
        engine.params = None
        gc.collect()
        engine.params = builder(jax.random.PRNGKey(0), eps)
        for tau in args.taus:
            tps, acc, drafts = timed(GenerationConfig(
                max_steps=args.max_steps, sample=False,
                generation_strategy="self_speculative",
                exit_layer=exit_layer, num_speculations=args.spec,
                draft_exit_prob=tau))
            points.append({
                "tail_eps": eps, "tau": tau, "acceptance": round(acc, 4),
                "spec_tokens_per_s": round(tps, 2),
                "speedup": round(tps / ar_tps, 4),
                "total_drafts": drafts,
            })
            print(f"[adaptive] eps={eps} tau={tau}: {tps:.1f} tok/s "
                  f"acc={acc:.3f} drafts={drafts} ({tps / ar_tps:.2f}x)",
                  file=sys.stderr)

    print(json.dumps({
        "metric": f"adaptive_draft_{args.config}",
        "ar_tokens_per_s": round(ar_tps, 2),
        "unit": "tok/s",
        "points": points,
    }))


if __name__ == "__main__":
    main()
