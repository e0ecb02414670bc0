"""On-chip A/B of int4 dequant-matmul formulations at decode shapes.

The packed-uint8 int4 path (ops/linear.py::unpack_int4) was measured at
4.36 tok/s for 7B AR decode — 11x slower than bf16 — because the nibble
interleave (stack+reshape along K) is a data-movement op XLA cannot fuse
into a dot operand: every step re-materializes the dequantized weights.

Candidate fixes keep the dot operands pure elementwise chains over the
packed bytes (shift -> convert -> scale), which fuse like the int8 path's
convert does, and move all strided access onto the tiny activation:

  splitk      out = x[:, 0::2] @ deq(lo) + x[:, 1::2] @ deq(hi)
              (lo/hi = sign-extended nibble halves, groupwise scale folded
              into the operand)
  splitk_post same contraction but per-(G/2)-group batched dots with the
              scale applied AFTER on the fp32 accumulator (the int8 trick;
              intermediate [K/G, M, N] is tiny at decode M)

Run serially on the chip:  timeout 3600 python scripts/profile_int4.py
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
    # 8 layers x 4096 x 11008 bf16 = 720 MB — far beyond VMEM, so the scan
    # still streams weights from HBM every step (bandwidth-realistic), but
    # the one-off param build stays ~50 s over the remote-execution tunnel
    # (32 layers took >10 min per variant)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--n", type=int, default=11008)
    ap.add_argument("--m", type=int, default=1)
    ap.add_argument("--group", type=int, default=128)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--variants", default="bf16,int8,int4_interleave,"
                    "int4_splitk,int4_splitk_post")
    ap.add_argument("--blk-n", type=int, default=512,
                    help="int4_pallas* block_n")
    ap.add_argument("--blk-kp", type=int, default=512,
                    help="int4_pallas* block_kp")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    L, K, N, M, G = args.layers, args.k, args.n, args.m, args.group
    g2 = G // 2

    def run_variant(name):
        key = jax.random.PRNGKey(0)

        if name == "bf16":
            build = jax.jit(lambda k: jax.random.normal(k, (L, K, N), jnp.bfloat16) * 0.02)
            w = build(key)

            def apply(h, wl):
                return h @ wl
        elif name == "int8":
            def _b(k):
                wf = jax.random.normal(k, (L, K, N), jnp.float32) * 0.02
                s = jnp.maximum(jnp.max(jnp.abs(wf), axis=-2) / 127.0, 1e-8)
                q = jnp.clip(jnp.round(wf / s[:, None, :]), -127, 127).astype(jnp.int8)
                return q, s
            w = jax.jit(_b)(key)

            def apply(h, wl):
                q, s = wl
                acc = jax.lax.dot_general(h, q.astype(h.dtype),
                                          (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32)
                return (acc * s).astype(h.dtype)
        else:  # int4 variants share the packed build
            def _b(k):
                wf = jax.random.normal(k, (L, K, N), jnp.float32) * 0.02
                wg = wf.reshape(L, K // G, G, N)
                s = jnp.maximum(jnp.max(jnp.abs(wg), axis=-2) / 7.0, 1e-8)
                q = jnp.clip(jnp.round(wg / s[:, :, None, :]), -7, 7)
                # offset-binary nibbles (u = q + 8), matching pack_int4
                q = (q.reshape(L, K, N).astype(jnp.int32) + 8) & 0xF
                packed = (q[:, 0::2, :] | (q[:, 1::2, :] << 4)).astype(jnp.uint8)
                return packed, s  # packed [L, K/2, N], s [L, K/G, N]
            w = jax.jit(_b)(key)

            if name == "int4_interleave":
                def apply(h, wl):
                    p, s = wl
                    lo = (p & 0xF).astype(jnp.int8) - 8
                    hi = (p >> 4).astype(jnp.int8) - 8
                    q = jnp.stack([lo, hi], axis=-2).reshape(K, N)
                    deq = (q.astype(jnp.float32).reshape(K // G, G, N)
                           * s[:, None, :]).reshape(K, N).astype(h.dtype)
                    return h @ deq
            elif name == "int4_splitk":
                def apply(h, wl):
                    p, s = wl  # p [K/2, N], s [K/G, N]
                    lo = (p & 0xF).astype(jnp.float32) - 8.0
                    hi = (p >> 4).astype(jnp.float32) - 8.0
                    k2 = K // 2
                    dlo = (lo.reshape(k2 // g2, g2, N) * s[:, None, :]
                           ).reshape(k2, N).astype(h.dtype)
                    dhi = (hi.reshape(k2 // g2, g2, N) * s[:, None, :]
                           ).reshape(k2, N).astype(h.dtype)
                    return h[:, 0::2] @ dlo + h[:, 1::2] @ dhi
            elif name == "int4_splitk_post":
                def apply(h, wl):
                    p, s = wl
                    k2 = K // 2
                    lo = ((p & 0xF).reshape(k2 // g2, g2, N).astype(h.dtype)
                          - 8)
                    hi = ((p >> 4).reshape(k2 // g2, g2, N).astype(h.dtype)
                          - 8)
                    xe = h[:, 0::2].reshape(M, k2 // g2, g2).transpose(1, 0, 2)
                    xo = h[:, 1::2].reshape(M, k2 // g2, g2).transpose(1, 0, 2)
                    dims = (((2,), (1,)), ((0,), (0,)))  # batch over groups
                    acc = (jax.lax.dot_general(xe, lo, dims,
                                               preferred_element_type=jnp.float32)
                           + jax.lax.dot_general(xo, hi, dims,
                                                 preferred_element_type=jnp.float32))
                    return jnp.sum(acc * s[:, None, :], axis=0).astype(h.dtype)
            elif name == "int4_splitk_bf16":
                # split-K with the dequant chain held in bf16 end to end
                # (int4 magnitudes are exact in bf16; scales round to bf16,
                # <0.4% relative) — halves the VPU fp32 traffic of the
                # scale multiply if the unpack chain is compute-bound
                def apply(h, wl):
                    p, s = wl
                    lo = (p & 0xF).astype(h.dtype) - 8
                    hi = (p >> 4).astype(h.dtype) - 8
                    k2 = K // 2
                    sb = s.astype(h.dtype)
                    dlo = (lo.reshape(k2 // g2, g2, N) * sb[:, None, :]
                           ).reshape(k2, N)
                    dhi = (hi.reshape(k2 // g2, g2, N) * sb[:, None, :]
                           ).reshape(k2, N)
                    return h[:, 0::2] @ dlo + h[:, 1::2] @ dhi
            elif name == "int4_pallas":
                # ops/pallas/quant_matmul.py::int4_matmul — nibble unpack
                # INSIDE the kernel: packed bytes stream HBM->VMEM once,
                # VPU decodes + scales in VMEM, two sub-dots accumulate in
                # fp32 scratch. Runs the shipping default variant (fused —
                # won the v5e A/B; see the kernel-header post-mortem).
                from layerskip_tpu.ops.pallas.quant_matmul import int4_matmul

                def apply(h, wl):
                    p, s = wl
                    return int4_matmul(h, p, s, group=G,
                                       block_n=args.blk_n,
                                       block_kp=args.blk_kp)
            elif name == "int4_pallas_groupdot":
                # A/B variant: scale + sign offset off the per-element path
                # (unsigned-nibble sub-dots per scale group, rank-1 sign
                # correction). Lost on v5e: 1.66 ms vs fused 1.36.
                from layerskip_tpu.ops.pallas.quant_matmul import int4_matmul

                def apply(h, wl):
                    p, s = wl
                    return int4_matmul(h, p, s, group=G, variant="groupdot",
                                       block_n=args.blk_n,
                                       block_kp=args.blk_kp)
            elif name == "int4_pallas_bittrick":
                # fp-bit-trick decode (0x4300|u bitcast to bf16 == 128+u):
                # ~5 vector ops/element vs fused's ~11
                from layerskip_tpu.ops.pallas.quant_matmul import int4_matmul

                def apply(h, wl):
                    p, s = wl
                    return int4_matmul(h, p, s, group=G, variant="bittrick",
                                       block_n=args.blk_n,
                                       block_kp=args.blk_kp)
            elif name == "int4_pallas_fused16":
                from layerskip_tpu.ops.pallas.quant_matmul import int4_matmul

                def apply(h, wl):
                    p, s = wl
                    return int4_matmul(h, p, s, group=G, variant="fused16",
                                       block_n=args.blk_n,
                                       block_kp=args.blk_kp)
            elif name == "int4_lib":
                # the shipped path: ops/linear.py::_qdot split-K over a
                # stacked QuantTensor sliced per scan step
                from layerskip_tpu.ops.linear import QuantTensor, _qdot

                def apply(h, wl):
                    p, s = wl
                    return _qdot(h, QuantTensor(q=p, scale=s, group=G))
            else:
                raise SystemExit(f"unknown variant {name}")

        # the whole repeat loop lives INSIDE one program: per-dispatch RTT
        # through the remote-execution tunnel is ~6 ms — more than a full
        # 8-layer bf16 step — so host-side repeat loops measure the tunnel,
        # not the chip. One dispatch runs iters x L layer matmuls.
        # weights are an ARGUMENT, never a closure: a closed-over device
        # array is baked into the HLO as a literal constant, and the remote
        # compile then ships the whole multi-GB weight blob over the tunnel
        # (measured: L=32 bf16 "compile" burned >20 min and eventually broke
        # the compile server's pipe)
        @functools.partial(jax.jit, static_argnums=2)
        def run(h, w, iters):
            def outer(_, c):
                def body(cc, wl):
                    y = apply(cc, wl)
                    return jnp.tanh(y[:, :K]) * 0.5 + cc * 0.5, ()
                c2, _ = jax.lax.scan(body, c, w)
                return c2
            return jax.lax.fori_loop(0, iters, outer, h)

        import sys
        t_b = time.time()
        np.asarray(jax.tree.leaves(w)[0][0, :1])  # force the build
        print(f"[int4ab] {name}: build done {time.time()-t_b:.1f}s",
              file=sys.stderr, flush=True)
        h = jnp.ones((M, K), jnp.bfloat16) * 0.01
        t_c = time.time()
        np.asarray(run(h, w, 1))  # compile + warm (iters=1 shares the cache
        # key shape; static arg recompiles below — warm the big one too)
        print(f"[int4ab] {name}: 1-iter compiled {time.time()-t_c:.1f}s",
              file=sys.stderr, flush=True)
        t_c = time.time()
        np.asarray(run(h, w, args.iters))
        print(f"[int4ab] {name}: {args.iters}-iter compiled "
              f"{time.time()-t_c:.1f}s", file=sys.stderr, flush=True)
        t0 = time.time()
        h2 = run(h, w, args.iters)
        np.asarray(h2)
        dt = (time.time() - t0) / args.iters
        # ideal bytes/step read from HBM for the weights
        wbytes = sum(int(np.prod(x.shape)) * x.dtype.itemsize
                     for x in jax.tree.leaves(w))
        gbs = wbytes / dt / 1e9
        print(f"[int4ab] {name:18s} {dt*1e3:8.2f} ms/step  "
              f"{gbs:7.1f} GB/s effective (weights {wbytes/1e9:.2f} GB)",
              flush=True)
        del w
        return dt

    for v in args.variants.split(","):
        run_variant(v.strip())


if __name__ == "__main__":
    main()
