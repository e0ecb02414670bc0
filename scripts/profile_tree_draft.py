"""Pinpoint the 7B tree-draft slowdown: which difference from the linear
draft breaks the in-body weight-gather fusion?

Measured in the engine: a tree draft step costs ~12 ms vs the linear
draft's ~4.5 ms at 7B — ~3x the early-group weight bytes, the signature
of XLA materializing the per-layer gathered weights (read + write +
read-back) instead of fusing the dynamic-slice into the matmuls.
Width-independent (tree2 == tree3 ceilings), so it is not the query
count.

Fusion is STRUCTURE-sensitive: a first harness that wrapped run_layers in
a bare fori_loop measured ~100 ms/step for the *linear* shape too (32
GB/s — nothing fused), while the engine's linear draft fuses at roofline
inside while_loop{scan{scan}}. This harness therefore mirrors the
engine's exact nesting — lax.while_loop (rounds) of lax.scan (depth W)
of run_layers (lax.scan over layers) — and flips one thing at a time:

  linear : forward_early per step, M=1 (the engine's linear dstep)
  linM   : forward_early-equivalent at M=k (same args, wider query)
  treeB  : + q_positions / write_pos overrides (no tree_meta)
  tree   : + tree_meta (the engine's tree dstep)

Run serially on the chip: timeout 3600 python scripts/profile_tree_draft.py
"""

import argparse
import functools
import os
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_REPO, ".jax_cache"))
import sys  # noqa: E402
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="7b")
    ap.add_argument("--m", type=int, default=3)  # tree width k
    ap.add_argument("--w", type=int, default=6)  # draft depth
    ap.add_argument("--s", type=int, default=512)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--variants", default="linear,linM,treeB,tree")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_config, make_param_builder
    from layerskip_tpu.models import llama
    from layerskip_tpu.models.llama import KVCache

    cfg = build_config(args.config)
    e, w, kk = 8, args.w, args.m
    params = make_param_builder(cfg, e)(jax.random.PRNGKey(0), 0.0)
    b, s = 1, args.s
    hkv, dh = cfg.num_key_value_heads, cfg.head_dim
    kv0 = jnp.zeros((e, b, s, hkv, dh), cfg.dtype)
    ctx0 = jnp.full((b,), 37, jnp.int32)

    def make_run(variant):
        m = 1 if variant == "linear" else kk

        @functools.partial(jax.jit, static_argnums=(1,))
        def run(params, iters, k0, v0, ctx, tok0):
            def cond(c):
                return c[0] < iters

            def body(c):
                it, ke, ve, ctx, tok = c

                def dstep(carry, i):
                    ke, ve, tips = carry
                    if variant == "linear":
                        r = llama.forward_early(
                            params, cfg, tips, KVCache(k=ke, v=ve),
                            ctx + i, e)
                        nxt = jnp.argmax(
                            r.logits[:, -1], axis=-1
                        ).astype(jnp.int32)[:, None]
                        return (r.cache.k, r.cache.v, nxt), ()
                    h = llama.embed_tokens(params, tips, cfg)
                    kw = {}
                    if variant in ("treeB", "tree"):
                        kw["q_positions"] = jnp.broadcast_to(
                            (ctx + 1 + i)[:, None], (b, m))
                        kw["write_pos"] = ctx + 1 + i * m
                    if variant == "tree":
                        q_chain = jnp.broadcast_to(
                            jnp.arange(m, dtype=jnp.int32)[None], (b, m))
                        kw["tree_meta"] = (q_chain,
                                           (ctx + 1).astype(jnp.int32), m)
                    h, ke, ve = llama.run_layers(
                        cfg, params.layers, h, ke, ve, ctx + i,
                        layer_offset=0, **kw)
                    logits = llama.lm_logits(params, cfg, h)
                    nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    return (ke, ve, nxt), ()

                (ke, ve, tok), _ = jax.lax.scan(
                    dstep, (ke, ve, tok), jnp.arange(w, dtype=jnp.int32))
                return (it + 1, ke, ve, ctx, tok)

            out = jax.lax.while_loop(
                cond, body, (jnp.int32(0), k0, v0, ctx, tok0))
            return out[4]

        return run

    wbytes = e * (4 * cfg.hidden_size * cfg.num_attention_heads * dh
                  + 3 * cfg.hidden_size * cfg.intermediate_size) * 2
    for variant in args.variants.split(","):
        m = 1 if variant == "linear" else kk
        tok0 = jnp.full((b, m), 11, jnp.int32)
        run = make_run(variant)
        t0 = time.time()
        np.asarray(run(params, 1, kv0, kv0, ctx0, tok0))
        print(f"[treedraft] {variant}: compiled {time.time()-t0:.1f}s",
              file=sys.stderr, flush=True)
        t0 = time.time()
        np.asarray(run(params, args.iters, kv0, kv0, ctx0, tok0))
        dt = (time.time() - t0) / (args.iters * w)
        print(f"[treedraft] {variant:7s} {dt*1e3:7.2f} ms/step  "
              f"{wbytes/dt/1e9:6.1f} GB/s effective", flush=True)


if __name__ == "__main__":
    main()
