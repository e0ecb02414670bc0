"""Long-context decode benchmark: end-to-end generation over a ~30k context.

The capability proof for SURVEY §5.7 long-context on a single chip: the
whole pipeline (flash-prefill kernel over the 30k prompt, XLA fused decode
attention, position-capped logits-at-last-position prefill) runs a 30k-token
context end to end. Without the flash prefill kernel this cannot run at
all — the dense-mask prefill wants an f32[1,8,4,30720,31232] score tensor
(123 TB) and fails to compile.

(An A/B against a Pallas decode kernel used to live here; the contiguous
decode kernels were removed after XLA's fused attention measured faster at
every decode shape — see ops/pallas/decode_attention.py.)

Prints one JSON line.

Usage: python scripts/bench_longctx.py [--config 1b] [--ctx 30720]
       [--max-steps 128]
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
    ap.add_argument("--config", default="1b")
    ap.add_argument("--ctx", type=int, default=30720)
    ap.add_argument("--max-steps", type=int, default=128)
    ap.add_argument("--exit-layer", type=int, default=8)
    ap.add_argument("--spec", type=int, default=6)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    import jax
    import numpy as np

    from bench import build_config, make_param_builder
    from layerskip_tpu.config import GenerationConfig
    from layerskip_tpu.generation.engine import Engine, postprocess_output

    cfg = build_config(args.config)
    exit_layer = min(args.exit_layer, max(cfg.num_hidden_layers // 2, 1))
    params = make_param_builder(cfg, exit_layer)(jax.random.PRNGKey(0), 0.0)
    engine = Engine(params, cfg)
    prompt = list((np.arange(args.ctx) % (cfg.vocab_size - 7) + 3).tolist())
    seq_cap = args.ctx + args.max_steps + args.spec + 64

    def timed(gen_cfg):
        out = engine.generate(prompt, gen_cfg, jax.random.PRNGKey(0))
        np.asarray(out.tokens)  # compile+warm; D2H anchors timing
        best = 0.0
        for i in range(args.repeats):
            t0 = time.time()
            out = engine.generate(prompt, gen_cfg, jax.random.PRNGKey(i))
            toks = postprocess_output(out, (), gen_cfg.max_steps)
            best = max(best, len(toks) / (time.time() - t0))
        return best

    ar = timed(GenerationConfig(
        max_steps=args.max_steps, sample=False,
        generation_strategy="autoregressive", max_seq_len=seq_cap))
    sp = timed(GenerationConfig(
        max_steps=args.max_steps, sample=False,
        generation_strategy="self_speculative",
        exit_layer=exit_layer, num_speculations=args.spec,
        max_seq_len=seq_cap))
    print(f"[longctx] AR {ar:.1f} / spec {sp:.1f} tok/s", file=sys.stderr)
    print(json.dumps({
        "metric": f"longctx_decode_{args.config}_ctx{args.ctx}",
        "unit": "tok/s",
        "ar_tokens_per_s": round(ar, 2),
        "spec_tokens_per_s": round(sp, 2),
        "spec_speedup": round(sp / max(ar, 1e-9), 3),
    }))


if __name__ == "__main__":
    main()
