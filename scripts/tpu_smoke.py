"""On-chip smoke test for the Pallas kernel hot path (small, fast compiles).

Runs a small-but-kernel-eligible model (head_dim=64, D=256) on the real TPU:
  1. greedy AR == greedy self-spec (the reference's correctness bar) with the
     Pallas decode/verify attention + fused RMSNorm dispatched;
  2. the same outputs with LAYERSKIP_TPU_DISABLE_PALLAS=1 (XLA-only paths) —
     kernels must not change the token stream;
  3. a sliding-window (Mistral-style) generation, kernels vs XLA-only.

Usage: python scripts/tpu_smoke.py  (runs on the default backend — the TPU;
set LAYERSKIP_TPU_DISABLE_PALLAS=1 externally to force the XLA baseline).
The pallas-vs-xla comparison spawns a subprocess for the disabled variant
because the dispatch decision is baked at trace time.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def build(sliding_window=None):
    import jax
    import jax.numpy as jnp

    # exact accumulation: the random model's token stream degenerates into a
    # loop whose near-tied logits flip argmax under bf16 matmuls — the
    # cross-path equality this smoke asserts needs deterministic numerics
    jax.config.update("jax_default_matmul_precision", "highest")

    from layerskip_tpu.config import tiny_config
    from layerskip_tpu.models.params import init_params

    cfg = tiny_config(
        num_hidden_layers=4,
        hidden_size=256,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=512,
        vocab_size=512,
        max_position_embeddings=1024,
        dtype=jnp.float32,  # exactness > speed in a correctness smoke
    )
    if sliding_window is not None:
        import dataclasses

        cfg = dataclasses.replace(cfg, sliding_window=sliding_window)
    params = init_params(jax.random.PRNGKey(7), cfg)
    return cfg, params


def run(sliding_window=None, kv_quant=False):
    import jax

    from layerskip_tpu.config import GenerationConfig
    from layerskip_tpu.generation.engine import Engine, postprocess_output

    cfg, params = build(sliding_window)
    eng = Engine(params, cfg)
    prompt = list(range(3, 35))
    ar = postprocess_output(
        eng.generate(prompt, GenerationConfig(
            max_steps=48, sample=False, generation_strategy="autoregressive",
            kv_quant=kv_quant,
        ), jax.random.PRNGKey(0)), (), 48)
    sp = postprocess_output(
        eng.generate(prompt, GenerationConfig(
            max_steps=48, sample=False, generation_strategy="self_speculative",
            exit_layer=2, num_speculations=4, kv_quant=kv_quant,
        ), jax.random.PRNGKey(0)), (), 48)
    return {"ar": ar, "sp": sp}


def main():
    import jax

    if os.environ.get("_SMOKE_CHILD") == "1":
        out = {
            "dense": run(),
            "window": run(sliding_window=24),
            "q8": run(kv_quant=True),
        }
        print(json.dumps(out))
        return

    backend = jax.default_backend()
    print(f"[smoke] backend={backend} "
          f"pallas={'off' if os.environ.get('LAYERSKIP_TPU_DISABLE_PALLAS') == '1' else 'on'}",
          file=sys.stderr)
    results = {"dense": run(), "window": run(sliding_window=24),
               "q8": run(kv_quant=True)}
    for name, r in results.items():
        assert r["ar"] == r["sp"], (name, r["ar"], r["sp"])
        print(f"[smoke] {name}: AR==spec over {len(r['ar'])} tokens OK",
              file=sys.stderr)

    # XLA-only baseline in a subprocess (dispatch is trace-time)
    env = dict(os.environ, LAYERSKIP_TPU_DISABLE_PALLAS="1", _SMOKE_CHILD="1")
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        stdout=subprocess.PIPE, env=env,
    )
    assert proc.returncode == 0, proc.returncode
    base = json.loads(proc.stdout.decode().strip().splitlines()[-1])
    for name in results:
        assert results[name]["ar"] == base[name]["ar"], (name, "AR drifted")
        assert results[name]["sp"] == base[name]["sp"], (name, "spec drifted")
        print(f"[smoke] {name}: pallas == xla token stream OK", file=sys.stderr)
    print("TPU_SMOKE_PASS")


if __name__ == "__main__":
    main()
