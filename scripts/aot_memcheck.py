"""AOT-compile the generation programs with abstract args and print memory.

Iterating on 7B compile-OOMs is slow if each attempt pays real param init
(~200 s); this lowers with jax.ShapeDtypeStruct inputs only and prints the
compiled memory analysis (argument/temp/peak bytes) — or the OOM breakdown.

Usage: python scripts/aot_memcheck.py [--config 7b] [--mode spec|ar]
       [--max-steps 512] [--spec 6] [--exit-layer 8]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="7b")
    ap.add_argument("--mode", default="spec", choices=["spec", "ar", "train"])
    ap.add_argument("--max-steps", type=int, default=512)
    ap.add_argument("--spec", type=int, default=6)
    ap.add_argument("--exit-layer", type=int, default=8)
    ap.add_argument("--prompt-bucket", type=int, default=64)
    ap.add_argument("--draft-quant", type=int, default=0, choices=(0, 8, 4),
                    help="spec mode: AOT the quantized-drafter program "
                         "(int8/int4 draft copy of layers [0, exit); the "
                         "dq4 7B OOM diagnosis tool)")
    # train mode
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--seq-len", type=int, default=2048)
    ap.add_argument("--ce-chunk", type=int, default=1024)
    args = ap.parse_args()

    from bench import build_config
    from layerskip_tpu.generation.engine import ar_generate, spec_generate
    from layerskip_tpu.generation.sampling import SamplingConfig
    from layerskip_tpu.models.llama import LayerParams, LlamaParams

    cfg = build_config(args.config)
    d, f, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    hq, hkv, dh, nl = (
        cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim,
        cfg.num_hidden_layers,
    )
    S = jax.ShapeDtypeStruct
    dt = cfg.dtype
    params = LlamaParams(
        embed=S((v, d), dt),
        layers=LayerParams(
            attn_norm=S((nl, d), dt), wq=S((nl, hq * dh, d), dt),
            wk=S((nl, hkv * dh, d), dt), wv=S((nl, hkv * dh, d), dt),
            wo=S((nl, hq * dh, d), dt), mlp_norm=S((nl, d), dt),
            w_gate=S((nl, d, f), dt), w_up=S((nl, d, f), dt),
            w_down=S((nl, f, d), dt),
        ),
        final_norm=S((d,), dt),
        lm_head=None if cfg.tie_word_embeddings else S((d, v), dt),
    )
    ids = S((1, args.prompt_bucket), jnp.int32)
    true_len = S((1,), jnp.int32)
    rng = S((2,), jnp.uint32)
    scfg = SamplingConfig(sample=False, temperature=0.6, top_k=0, top_p=0.9)
    max_cache_len = args.prompt_bucket + args.max_steps + args.spec + 2

    if args.mode == "train":
        # AOT-compile the default-config LayerSkip train step (sparse
        # quarter-depth exits + chunked CE) — the 7B-fits-one-v5e proof.
        from layerskip_tpu.training.recipe import TrainConfig, make_train_step

        tcfg = TrainConfig(ce_chunk_tokens=args.ce_chunk)
        train_step, init_opt = make_train_step(cfg, tcfg)
        # eval_shape: abstract opt state from abstract params (no host alloc)
        opt_state = jax.eval_shape(init_opt, params)
        ids_t = S((args.batch, args.seq_len), jnp.int32)
        labels_t = S((args.batch, args.seq_len), jnp.int32)
        lowered = jax.jit(train_step, donate_argnums=(0, 1)).lower(
            params, opt_state, ids_t, labels_t, rng, S((), jnp.int32)
        )
        print("lowered; compiling...", flush=True)
        try:
            compiled = lowered.compile()
        except Exception as exc:
            print("COMPILE FAILED:")
            for line in str(exc).splitlines()[:40]:
                print("  " + line.strip())
            return 1
        mem = compiled.memory_analysis()
        print(f"argument bytes: {mem.argument_size_in_bytes/2**30:.2f} GiB")
        print(f"temp bytes:     {mem.temp_size_in_bytes/2**30:.2f} GiB")
        print(f"total:          {(mem.argument_size_in_bytes+mem.temp_size_in_bytes)/2**30:.2f} GiB")
        return 0

    if args.mode == "spec" and args.draft_quant:
        from layerskip_tpu.quant import quantize_draft_params

        # abstract draft pytree from the same code that builds the real one
        draft = jax.eval_shape(
            lambda p: quantize_draft_params(
                p, args.exit_layer, bits=args.draft_quant,
                quantize_head=False,
            ),
            params,
        )

        def fn(params, draft, ids, true_len, rng):
            return spec_generate(
                params, cfg, ids, true_len, rng,
                max_steps=args.max_steps, exit_layer=args.exit_layer,
                num_speculations=args.spec, scfg=scfg, eos_ids=(2,),
                max_cache_len=max_cache_len, draft_params=draft,
            )

        lowered = jax.jit(fn).lower(params, draft, ids, true_len, rng)
    elif args.mode == "spec":
        def fn(params, ids, true_len, rng):
            return spec_generate(
                params, cfg, ids, true_len, rng,
                max_steps=args.max_steps, exit_layer=args.exit_layer,
                num_speculations=args.spec, scfg=scfg, eos_ids=(2,),
                max_cache_len=max_cache_len,
            )

        lowered = jax.jit(fn).lower(params, ids, true_len, rng)
    else:
        def fn(params, ids, true_len, rng):
            return ar_generate(
                params, cfg, ids, true_len, rng,
                max_steps=args.max_steps, exit_layer=-1, scfg=scfg,
                eos_ids=(2,), max_cache_len=max_cache_len,
            )

        lowered = jax.jit(fn).lower(params, ids, true_len, rng)
    print("lowered; compiling...", flush=True)
    try:
        compiled = lowered.compile()
    except Exception as exc:
        text = str(exc)
        print("COMPILE FAILED:")
        for line in text.splitlines():
            if any(k in line for k in (
                "memory", "hbm", "Largest", "Size:", "label", "Shape",
                "Operator", "source_line",
            )):
                print("  " + line.strip())
        return 1
    try:
        mem = compiled.memory_analysis()
        print(f"argument bytes: {mem.argument_size_in_bytes/2**30:.2f} GiB")
        print(f"output bytes:   {mem.output_size_in_bytes/2**30:.2f} GiB")
        print(f"temp bytes:     {mem.temp_size_in_bytes/2**30:.2f} GiB")
        print(f"total:          {(mem.argument_size_in_bytes+mem.temp_size_in_bytes)/2**30:.2f} GiB")
    except Exception as exc:
        print("no memory_analysis:", exc)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
