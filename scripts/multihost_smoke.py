"""Two-process ``jax.distributed`` rehearsal on localhost (VERDICT r4 #7).

The 2-host >=85% scaling target (BASELINE.md) needs hardware this container
does not have, but the *runtime path* — ``jax.distributed.initialize`` via
``parallel.distributed.setup``, cross-process (DCN-equivalent) collectives,
a global mesh spanning both processes, and a tp-sharded decode over it —
is testable with two localhost CPU processes. This script spawns them,
joins the distributed runtime, and checks:

  1. process_allgather sees both ranks (the gRPC/DCN path works),
  2. a jit'd psum over a global 2x4 (dp, tp) mesh reduces across processes,
  3. a tp=8 sharded tiny self-speculative decode over the GLOBAL mesh
     emits exactly the single-process reference token stream.

Usage: python scripts/multihost_smoke.py            # parent: spawns 2 procs
       python scripts/multihost_smoke.py --rank N   # child (internal)
Exit 0 = all checks passed in both processes.
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PORT = int(os.environ.get("LAYERSKIP_SMOKE_PORT", "47621"))
NPROC = 2
LOCAL_DEVICES = 4  # per process -> 8 global


def child(rank: int) -> None:
    import jax

    # sitecustomize pins the axon TPU platform at interpreter startup; the
    # config override wins as long as no backend is initialized yet
    # (.claude/skills/verify gotcha #1)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", LOCAL_DEVICES)

    from layerskip_tpu.parallel.distributed import setup

    setup(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=NPROC,
        process_id=rank,
    )
    assert jax.process_count() == NPROC, jax.process_count()
    assert jax.device_count() == NPROC * LOCAL_DEVICES, jax.device_count()
    assert jax.local_device_count() == LOCAL_DEVICES

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    # 1. cross-process allgather (the DCN-equivalent control path)
    ranks = multihost_utils.process_allgather(jnp.asarray([rank]))
    got = sorted(np.asarray(ranks).ravel().tolist())
    assert got == list(range(NPROC)), got
    print(f"[rank {rank}] allgather sees ranks {got} OK", flush=True)

    # 2. a psum over the global (dp, tp) mesh: per-device partial sums must
    # reduce across BOTH processes
    mesh = Mesh(
        np.asarray(jax.devices()).reshape(NPROC, LOCAL_DEVICES), ("dp", "tp")
    )
    n = NPROC * LOCAL_DEVICES

    @jax.jit
    def global_sum():
        x = jax.lax.with_sharding_constraint(
            jnp.arange(n * 8, dtype=jnp.float32).reshape(n, 8),
            NamedSharding(mesh, P(("dp", "tp"), None)),
        )
        return jnp.sum(x)  # GSPMD inserts the cross-process reduction

    total = float(global_sum())
    want = float(n * 8 * (n * 8 - 1) / 2)
    assert total == want, (total, want)
    print(f"[rank {rank}] global-mesh psum == {want:.0f} OK", flush=True)

    # 3. tp=8 sharded decode over the global mesh == single-process stream
    from layerskip_tpu.config import tiny_config
    from layerskip_tpu.generation.engine import postprocess_output, spec_generate
    from layerskip_tpu.generation.sampling import SamplingConfig
    from layerskip_tpu.models.params import init_params
    from layerskip_tpu.parallel.sharding import shard_params

    cfg = tiny_config(dtype=jnp.bfloat16)
    params = init_params(jax.random.PRNGKey(1), cfg)  # identical on all ranks
    scfg = SamplingConfig(sample=False, temperature=0.6, top_k=0, top_p=0.9)
    max_steps = 12
    pad = np.zeros((1, 8), np.int32)
    prompt = [3, 17, 52, 9, 30]
    pad[0, : len(prompt)] = prompt
    tl = np.asarray([len(prompt)], np.int32)

    def gen(p, ids, true_len, rng):
        return spec_generate(
            p, cfg, ids, true_len, rng, max_steps=max_steps, exit_layer=2,
            num_speculations=3, scfg=scfg,
            eos_ids=tuple(cfg.eos_token_ids),
            max_cache_len=8 + max_steps + 3 + 2,
        )

    # reference: a plain local-device program (no mesh)
    ref_out = jax.jit(gen)(params, pad, tl, jax.random.PRNGKey(0))
    ref = postprocess_output(jax.device_get(ref_out), (), max_steps)
    # cross-process: params tp-sharded over BOTH processes; outputs pinned
    # replicated so every process can materialize them host-side
    tp_mesh = Mesh(np.asarray(jax.devices()).reshape(1, n), ("dp", "tp"))
    sharded = shard_params(params, tp_mesh)
    with tp_mesh:
        out = jax.jit(
            gen, out_shardings=NamedSharding(tp_mesh, P())
        )(sharded, pad, tl, jax.random.PRNGKey(0))
    got_toks = postprocess_output(jax.device_get(out), (), max_steps)
    assert got_toks == ref, (got_toks, ref)
    print(f"[rank {rank}] tp={n} cross-process spec decode == "
          f"single-process ({len(ref)} tokens) OK", flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, default=-1)
    args = ap.parse_args()
    if args.rank >= 0:
        child(args.rank)
        return 0

    # pick a free coordinator port unless the caller pinned one — a fixed
    # default collides with concurrent runs (e.g. the slow-tier test while
    # a manual smoke or an orphaned child from a timed-out run is alive)
    port = os.environ.get("LAYERSKIP_SMOKE_PORT")
    if port is None:
        import socket

        with socket.socket() as sk:
            sk.bind(("127.0.0.1", 0))
            port = str(sk.getsockname()[1])
    env = dict(os.environ, LAYERSKIP_SMOKE_PORT=port)
    procs = []
    for r in range(NPROC):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--rank", str(r)],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env,
        ))
    ok = True
    for r, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            ok = False
        text = out.decode(errors="replace")
        sys.stdout.write(text)
        if p.returncode != 0:
            ok = False
            print(f"[parent] rank {r} FAILED rc={p.returncode}")
    print("[parent] multihost smoke:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
