"""Long-context decode benchmark: Pallas KV-blocked attention vs XLA path.

VERDICT r1 #3's bar: kernel parity at S >= 32k and an on-chip bench beating
the XLA fallback. Interpret-mode tests cap at S ~1.5k (Python-speed), so
this script does both on real hardware:

  1. numeric parity of `gqa_attention` Pallas vs XLA at S = 32768,
  2. end-to-end AR + self-spec decode rates over a ~30k-token context,
     kernel on vs `LAYERSKIP_TPU_DISABLE_PALLAS=1` (in-process toggle).

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
    ap.add_argument("--parity-s", type=int, default=32768)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_config, make_param_builder
    from layerskip_tpu.config import GenerationConfig
    from layerskip_tpu.generation.engine import Engine, postprocess_output
    from layerskip_tpu.ops import attention as attn_mod

    cfg = build_config(args.config)
    result = {"metric": f"longctx_decode_{args.config}_ctx{args.ctx}",
              "unit": "tok/s"}

    # ---- 1) on-chip numeric parity at S = parity_s -------------------------
    s_len, dh, hkv, g = args.parity_s, cfg.head_dim, 2, 2
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, 1, hkv * g, dh)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, s_len, hkv, dh)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, s_len, hkv, dh)), jnp.bfloat16)
    qpos = jnp.asarray([[s_len - 2]], jnp.int32)

    def attn(q, k, v):
        return attn_mod.gqa_attention(q, k, v, qpos, q_heads_per_kv=g)

    got = np.asarray(jax.jit(attn)(q, k, v), np.float32)
    os.environ["LAYERSKIP_TPU_DISABLE_PALLAS"] = "1"
    try:
        ref = np.asarray(jax.jit(attn)(q, k, v), np.float32)
    finally:
        del os.environ["LAYERSKIP_TPU_DISABLE_PALLAS"]
    err = float(np.max(np.abs(got - ref)))
    print(f"[longctx] parity S={s_len}: max|pallas - xla| = {err:.2e}",
          file=sys.stderr)
    assert err < 0.05, f"kernel parity failure at S={s_len}: {err}"
    result["parity_s"] = s_len
    result["parity_max_abs_err"] = err

    # ---- 2) end-to-end decode over a long context --------------------------
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

    for label, disable in (("pallas", False), ("xla", True)):
        if disable:
            os.environ["LAYERSKIP_TPU_DISABLE_PALLAS"] = "1"
            engine._exec_cache.clear()  # retrace with the kernel gated off
        try:
            ar = timed(GenerationConfig(
                max_steps=args.max_steps, sample=False,
                generation_strategy="autoregressive", max_seq_len=seq_cap))
            sp = timed(GenerationConfig(
                max_steps=args.max_steps, sample=False,
                generation_strategy="self_speculative",
                exit_layer=exit_layer, num_speculations=args.spec,
                max_seq_len=seq_cap))
        finally:
            os.environ.pop("LAYERSKIP_TPU_DISABLE_PALLAS", None)
        result[f"ar_{label}"] = round(ar, 2)
        result[f"spec_{label}"] = round(sp, 2)
        print(f"[longctx] {label}: AR {ar:.1f} / spec {sp:.1f} tok/s",
              file=sys.stderr)

    result["ar_kernel_speedup"] = round(
        result["ar_pallas"] / max(result["ar_xla"], 1e-9), 3)
    result["spec_kernel_speedup"] = round(
        result["spec_pallas"] / max(result["spec_xla"], 1e-9), 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
