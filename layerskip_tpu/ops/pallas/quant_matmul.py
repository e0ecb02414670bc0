"""Pallas TPU kernel: int8 weight-only quantized matmul, per-channel scales.

No counterpart in the reference (pure fp16 torch); this is the TPU-native
analogue of the fused dequant-matmul CUDA kernels serving stacks rely on.
Weights are stored int8 with one fp32 scale per output channel
(``w ≈ w_q * scale[None, :]``); activations stay bf16/fp32. The kernel
accumulates x @ w_q in fp32 on the MXU over K-blocks and applies the column
scales once at the end — halving weight HBM traffic, which is what bounds
single-stream decode.

``quantize_weights`` is the symmetric per-channel quantizer used by
layerskip_tpu.quant to compress a whole LlamaParams tree.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_weights(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[K, N] float -> ([K, N] int8, [N] fp32 scales), symmetric per-channel."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0)  # [N]
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(wf / scale[None, :]), -127, 127).astype(jnp.int8)
    return q, scale


def _dot_precision(dtype) -> jax.lax.Precision:
    """MXU operand precision for the in-kernel dot.

    ``preferred_element_type=fp32`` only picks the ACCUMULATOR dtype; at the
    default precision the MXU truncates fp32 *operands* to one bf16 pass
    (measured on v5e: max_abs_err 0.13 vs a precision='highest' fp32 oracle
    at K=512 N(0,1) inputs — exactly bf16 operand rounding). bf16
    activations and int8->bf16 weights are exact in bf16, so production
    decode takes the fast single-pass path; fp32 callers (e.g. a quantized
    LM head fed fp32 hidden states) get the 3-pass bf16 emulation."""
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _qmm_kernel(
    x_ref, wq_ref, scale_ref, o_ref, acc_ref, *, k_blocks: int, k_total: int
):
    """Grid (M/bm, N/bn, K/bk); K is innermost and accumulates in VMEM."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]  # [bm, bk] activation dtype
    w = wq_ref[:].astype(x.dtype)  # [bk, bn] int8 -> activation dtype for MXU
    bk = x.shape[1]
    if k_total % bk:  # ragged K tail: zero padded columns/rows explicitly
        valid = k_total - kb * bk
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        x = jnp.where(col < valid, x, 0)
        row = jax.lax.broadcasted_iota(jnp.int32, w.shape, 0)
        w = jnp.where(row < valid, w, 0)
    acc_ref[:] += jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(x.dtype),
    )

    @pl.when(kb == k_blocks - 1)
    def _():
        o_ref[:] = (acc_ref[:] * scale_ref[0].astype(jnp.float32)[None, :]).astype(
            o_ref.dtype
        )


def _qmm_t_kernel(
    x_ref, wq_ref, scale_ref, o_ref, acc_ref, *, k_blocks: int, k_total: int
):
    """Transposed-weight variant: w stored [N, K], contraction on K."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]  # [bm, bk]
    w = wq_ref[:].astype(x.dtype)  # [bn, bk]
    bk = x.shape[1]
    if k_total % bk:
        valid = k_total - kb * bk
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        x = jnp.where(col < valid, x, 0)
        wcol = jax.lax.broadcasted_iota(jnp.int32, w.shape, 1)
        w = jnp.where(wcol < valid, w, 0)
    acc_ref[:] += jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(x.dtype),  # see _dot_precision
    )

    @pl.when(kb == k_blocks - 1)
    def _():
        o_ref[:] = (acc_ref[:] * scale_ref[0].astype(jnp.float32)[None, :]).astype(
            o_ref.dtype
        )


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "block_k", "interpret")
)
def quant_matmul_t(
    x: jnp.ndarray,  # [M, K] bf16/fp32
    w_q: jnp.ndarray,  # [N, K] int8 (transposed storage)
    scale: jnp.ndarray,  # [N] fp32
    *,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """x @ (w_q * scale)^T with fp32 accumulation; returns x.dtype."""
    m, k = x.shape
    n, k2 = w_q.shape
    assert k == k2 and scale.shape == (n,)
    bm, bn, bk = min(block_m, m), min(block_n, n), min(block_k, k)
    k_blocks = pl.cdiv(k, bk)
    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn), k_blocks)
    return pl.pallas_call(
        functools.partial(_qmm_t_kernel, k_blocks=k_blocks, k_total=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kb: (i, kb), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bk), lambda i, j, kb: (j, kb), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kb: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, kb: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * x.dtype.itemsize + k * n + m * n * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, w_q, scale.reshape(1, -1))


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "block_k", "interpret")
)
def quant_matmul(
    x: jnp.ndarray,  # [M, K] bf16/fp32
    w_q: jnp.ndarray,  # [K, N] int8
    scale: jnp.ndarray,  # [N] fp32
    *,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """x @ (w_q * scale) with fp32 accumulation; returns x.dtype."""
    m, k = x.shape
    k2, n = w_q.shape
    assert k == k2 and scale.shape == (n,)
    bm, bn, bk = min(block_m, m), min(block_n, n), min(block_k, k)
    k_blocks = pl.cdiv(k, bk)
    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn), k_blocks)
    return pl.pallas_call(
        functools.partial(_qmm_kernel, k_blocks=k_blocks, k_total=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kb: (i, kb), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kb: (kb, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kb: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, kb: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * x.dtype.itemsize + k * n + m * n * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, w_q, scale.reshape(1, -1))


# ---------------------------------------------------------------------------
# Groupwise int4 (nibble-packed uint8) dequant-matmul.
#
# The XLA split-K formulation (ops/linear.py::_qdot, group branch) measures
# 1.72 ms at M=8, K=4096, N=11008 on v5e — ~20x above roofline (22.5 MB of
# packed bytes is ~0.03 ms of HBM and the unpack chain ~0.07 ms of VPU):
# XLA materializes the dequantized bf16 halves instead of fusing the
# shift/convert/scale chain into the dot's operand read. This kernel does
# the unpack *inside* the MXU pipeline: packed uint8 blocks stream
# HBM -> VMEM once, nibbles sign-extend and scale on the VPU in VMEM, and
# the two (even-K, odd-K) sub-dots accumulate into one fp32 scratch.
#
# Layouts mirror QuantTensor (layerskip_tpu/ops/linear.py):
#   int4_matmul    q [K/2, N] uint8, scale [K/G, N] fp32  (MLP orientation)
#   int4_matmul_t  q [N, K/2] uint8, scale [N, K/G] fp32  (attention [out,in])
# Byte at packed index i holds element 2i (low nibble) / 2i+1 (high).
# The even/odd activation split is done by the caller on the tiny [M, K]
# activation (x[:, 0::2], x[:, 1::2]) so all strided access stays off the
# weight stream.
#
# Variant A/B post-mortem (v5e, M=8 K=4096 N=11008 G=128, 50 iters,
# scripts/profile_int4.py --variants ...):
#   int8 Pallas 1.07 ms < int4 FUSED 1.36 < bf16 XLA 1.58 < groupdot 1.66
#   < XLA split-K 1.71 < fused16 1.74 < bittrick 1.76
# - fused WINS: dequantize the whole [bkp, bn] block with f32 elementwise,
#   two dots. Block-size sweep (bn/bkp in {256,512,1024}^2) moves it only
#   1.36-1.45 ms — the bound is the VPU convert chain, not grid overhead.
# - groupdot (scale on the [M, bn] group accumulator, rank-1 sign fix)
#   LOSES despite ~2 VPU ops/element: 16 tiny K=64 sub-dots per block cost
#   more MXU issue overhead than the saved VPU work.
# - bittrick (0x4300|u bitcast->bf16 == 128+u exactly; decode err 0.0)
#   LOSES: 16-bit VPU ops run at half thoughput vs 32-bit here, so "~5
#   cheap 16-bit ops" > "~11 32-bit ops" in wall time.
# - fused16 (whole chain in bf16) LOSES to fused: f32 elementwise is
#   faster than bf16 on this VPU generation.
# All four variants stay selectable for re-measurement on other TPU gens.
#
# Mosaic block-shape constraints (compiled TPU only — interpret mode hides
# them; learned from the r4 on-chip kernel_gate failure): the last two dims
# of every block must be (multiple of 8, multiple of 128) or equal the full
# array dims. The wrappers therefore self-align block_kp/block_n below, and
# the transposed kernel loads the FULL scale strip [bn, K/G] per block
# (lane = full dim, always legal; <= ~350 KB at 7B shapes) instead of a
# per-K-block scale tile whose lane would be bkp/g2 ~ 8.
# ---------------------------------------------------------------------------


def _align_bn(block_n: int, n: int) -> int:
    """Largest legal N-block <= block_n: multiple of 128 (lane of the output
    and scale blocks) unless it spans the whole dimension."""
    bn = min(block_n, n)
    if bn >= n:
        return n
    bn -= bn % 128
    return bn if bn >= 128 else n


def _pad_m(xe: jnp.ndarray, xo: jnp.ndarray, m: int):
    """Zero-pad the activation rows up to one full 8-sublane tile.

    Mosaic cannot compile the ragged-K masking at M < 8 ("Not implemented:
    Sublane broadcast", hit on-chip at M=1 — the AR-decode case; M=7/8
    compile fine). Padding M to the tile the hardware processes anyway is
    free on the MXU, and the pad rows produce pad output rows the wrapper
    slices off."""
    if m >= 8:
        return xe, xo, m
    pad = jnp.zeros((8 - m, xe.shape[1]), xe.dtype)
    return (jnp.concatenate([xe, pad]), jnp.concatenate([xo, pad]), 8)


def _align_bkp(block_kp: int, kp: int, g2: int, scale_blocked: bool) -> int:
    """Largest legal packed-K block <= block_kp.

    Lane of the x/weight blocks needs bkp % 128 == 0; group alignment needs
    bkp % g2 == 0; and when the SCALE is K-blocked too (non-transposed
    kernel), its sublane needs bkp/g2 % 8 == 0, i.e. bkp % (8*g2) == 0.
    A block spanning the whole dimension is legal regardless. Capped at
    2048: the fused variant materializes 2 * bkp * bn fp32 dequant blocks
    in VMEM (bkp=5504 whole-K at bn=512 is ~22 MB — VMEM overflow, probed
    on-chip; the bkp in {256..1024} sweep was perf-flat anyway)."""
    bkp = min(block_kp, kp, 2048)
    if bkp >= kp:
        return kp
    align = math.lcm(8 * g2 if scale_blocked else g2, 128)
    bkp -= bkp % align
    if bkp == 0:
        bkp = align if align < kp else kp
    return bkp


def _sx(b_i32: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """uint8 (as int32) -> decoded (low, high) int4 values in int32.

    Storage is OFFSET-BINARY (``u = q + 8`` — see ops/linear.py::pack_int4),
    so decode is mask/shift then subtract 8."""
    lo = (b_i32 & 0xF) - 8
    hi = (b_i32 >> 4) - 8
    return lo, hi


def _i4mm_kernel(
    xe_ref, xo_ref, qp_ref, s_ref, o_ref, acc_ref,
    *, k_blocks: int, kp_total: int, g2: int, variant: str, interp: bool
):
    """Grid (N/bn, Kp/bkp), Kp innermost; acc [M, bn] fp32 scratch.

    variants (measured on v5e via scripts/profile_int4.py):
      fused     sign-extend + groupwise-scale every weight element, one
                dot per nibble half — ~6 VPU ops per element.
      groupdot  dot the UNSIGNED nibbles per scale group and apply the
                scale to the tiny [M, bn] group accumulator instead of the
                [bkp, bn] weight stream; the int4 sign offset (q = u - 8)
                factors into a rank-1 correction -8 * (group-sums of x) @ s.
                ~2 VPU ops per weight element (mask/shift + convert).
    """
    kb = pl.program_id(1)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xe = xe_ref[:]  # [M, bkp]
    xo = xo_ref[:]
    b = qp_ref[:]  # [bkp, bn] uint8
    bkp, bn = b.shape
    if kp_total % bkp:  # ragged Kp tail: zero the padded activation columns
        # (weight/scale pad may be garbage — x columns are what both
        # variants contract over, and the groupdot correction also only
        # sees x, so zeroing x kills every pad contribution)
        valid = kp_total - kb * bkp
        col = jax.lax.broadcasted_iota(jnp.int32, xe.shape, 1)
        xe = jnp.where(col < valid, xe, 0)
        xo = jnp.where(col < valid, xo, 0)
    cdt = jnp.float32 if interp else xe.dtype  # interpret-mode CPU has no
    # bf16 x bf16 -> f32 DotThunk; on TPU keep operands in x.dtype
    prec = _dot_precision(cdt)
    dims = (((1,), (0,)), ((), ()))
    s = s_ref[:].astype(jnp.float32)  # [bkp // g2, bn]
    gpb = bkp // g2
    if kp_total % bkp:
        # pad SCALE rows can be arbitrary bit patterns (NaN included) and
        # NaN * 0 = NaN would poison the accumulator — zero fully-pad
        # groups (partially-valid groups keep their real scale; their pad
        # elements are killed by the x-column mask above)
        valid = kp_total - kb * bkp
        grow = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        s = jnp.where(grow * g2 < valid, s, 0.0)

    if variant == "groupdot":
        bi = b.astype(jnp.int32)  # Mosaic has no uint8->bf16 cast; go via i32
        ulo = (bi & 0xF).astype(cdt)  # unsigned nibbles, 0..15 exact in bf16
        uhi = (bi >> 4).astype(cdt)
        xec = xe.astype(cdt)
        xoc = xo.astype(cdt)
        part = acc_ref[:]
        for gi in range(gpb):  # static unroll: one sub-dot per scale group
            sl = slice(gi * g2, (gi + 1) * g2)
            plo = jax.lax.dot_general(
                xec[:, sl], ulo[sl, :], dims,
                preferred_element_type=jnp.float32, precision=prec)
            phi = jax.lax.dot_general(
                xoc[:, sl], uhi[sl, :], dims,
                preferred_element_type=jnp.float32, precision=prec)
            part += (plo + phi) * s[gi][None, :]
        # sign correction: q = u - 8  =>  -8 * sum_g (sum_{k in g} x) * s_g
        # Group sums via a dot against a block-diagonal ones mask — a
        # lane-dim reshape ([M, bkp] -> [M, gpb, g2]) is a Mosaic
        # "unsupported shape cast"; iota-compare + two tiny dots is not.
        xs = xe.astype(jnp.float32) + xo.astype(jnp.float32)
        grow = jax.lax.broadcasted_iota(jnp.int32, (bkp, gpb), 0)
        gcol = jax.lax.broadcasted_iota(jnp.int32, (bkp, gpb), 1)
        gmask = (grow // g2 == gcol).astype(jnp.float32)
        xsg = jax.lax.dot_general(
            xs, gmask, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)  # [M, gpb]
        part += -8.0 * jax.lax.dot_general(
            xsg, s, dims, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        acc_ref[:] = part
    elif variant == "bittrick":
        # fp-bit-trick decode: 0x4300 | u bitcast to bf16 is EXACTLY
        # 128 + u (bf16 exponent 2^7 => ulp 1 over [128, 256)), so the
        # nibble becomes a float in ~4 cheap ops — no i32->f32 convert,
        # no sign-extension: subtract 136 (= 128 + the offset-binary 8).
        # Scale multiply runs in the compute dtype (one extra rounding in
        # bf16 vs the fused f32 path, well under the +-scale/2 int4
        # quantization noise).
        bi = b.astype(jnp.int32)
        lo16 = (jnp.int32(0x4300) | (bi & 0xF)).astype(jnp.uint16)
        hi16 = (jnp.int32(0x4300) | (bi >> 4)).astype(jnp.uint16)
        blo = (jax.lax.bitcast_convert_type(lo16, jnp.bfloat16)
               - jnp.bfloat16(136.0)).astype(cdt)
        bhi = (jax.lax.bitcast_convert_type(hi16, jnp.bfloat16)
               - jnp.bfloat16(136.0)).astype(cdt)
        sc = s.astype(cdt)
        dlo = (blo.reshape(gpb, g2, bn) * sc[:, None, :]).reshape(bkp, bn)
        dhi = (bhi.reshape(gpb, g2, bn) * sc[:, None, :]).reshape(bkp, bn)
        acc_ref[:] += (
            jax.lax.dot_general(xe.astype(cdt), dlo, dims,
                                preferred_element_type=jnp.float32,
                                precision=prec)
            + jax.lax.dot_general(xo.astype(cdt), dhi, dims,
                                  preferred_element_type=jnp.float32,
                                  precision=prec)
        )
    else:
        # fused: dequantize the whole weight block, two dots. "fused" runs
        # the scale product in fp32 (one rounding); "fused16" keeps the
        # whole chain in the compute dtype — int4 magnitudes are exact in
        # bf16, the scale rounds (~0.4% rel), saving one f32 convert and
        # halving multiply width per element.
        bi = b.astype(jnp.int32)
        lo, hi = _sx(bi)
        sdt = cdt if variant == "fused16" else jnp.float32
        dlo = (lo.astype(sdt).reshape(gpb, g2, bn)
               * s.astype(sdt)[:, None, :]).reshape(bkp, bn).astype(cdt)
        dhi = (hi.astype(sdt).reshape(gpb, g2, bn)
               * s.astype(sdt)[:, None, :]).reshape(bkp, bn).astype(cdt)
        acc_ref[:] += (
            jax.lax.dot_general(xe.astype(cdt), dlo, dims,
                                preferred_element_type=jnp.float32,
                                precision=prec)
            + jax.lax.dot_general(xo.astype(cdt), dhi, dims,
                                  preferred_element_type=jnp.float32,
                                  precision=prec)
        )

    @pl.when(kb == k_blocks - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group", "block_n", "block_kp", "interpret", "variant"),
)
def int4_matmul(
    x: jnp.ndarray,  # [M, K] bf16/fp32
    q_packed: jnp.ndarray,  # [K/2, N] uint8 nibble pairs
    scale: jnp.ndarray,  # [K/G, N] fp32
    *,
    group: int,
    block_n: int = 512,
    block_kp: int = 512,
    interpret: bool = False,
    variant: str = "fused",
) -> jnp.ndarray:
    """x @ dequant(q_packed, scale) with fp32 accumulation; returns x.dtype."""
    m, k = x.shape
    kp, n = q_packed.shape
    assert k == 2 * kp and group % 2 == 0
    g2 = group // 2
    assert scale.shape == (k // group, n)
    bn = _align_bn(block_n, n)
    bkp = _align_bkp(block_kp, kp, g2, scale_blocked=True)
    k_blocks = pl.cdiv(kp, bkp)
    xe, xo = x[:, 0::2], x[:, 1::2]  # [M, Kp] each
    xe, xo, mp = _pad_m(xe, xo, m)
    grid = (pl.cdiv(n, bn), k_blocks)
    out = pl.pallas_call(
        functools.partial(_i4mm_kernel, k_blocks=k_blocks, kp_total=kp,
                          g2=g2, variant=variant, interp=interpret),
        grid=grid,
        in_specs=[
            pl.BlockSpec((mp, bkp), lambda j, kb: (0, kb), memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, bkp), lambda j, kb: (0, kb), memory_space=pltpu.VMEM),
            pl.BlockSpec((bkp, bn), lambda j, kb: (kb, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bkp // g2, bn), lambda j, kb: (kb, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mp, bn), lambda j, kb: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((mp, bn), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=2 * m * kp * x.dtype.itemsize + kp * n
            + (k // group) * n * 4 + m * n * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xe, xo, q_packed, scale)
    return out[:m] if mp != m else out


def _i4mm_t_kernel(
    xe_ref, xo_ref, qp_ref, s_ref, o_ref, acc_ref,
    *, k_blocks: int, kp_total: int, g2: int, variant: str, interp: bool
):
    """Transposed-weight variant: q [bn, bkp], contraction on packed K.

    Here the packed-K axis is the LANE dim of the weight block, and Mosaic
    has no lane-splitting reshape / jnp.repeat lowering (both probed:
    "unsupported shape cast" / failed legalization on v5e), so the
    groupwise scale expands [bn, gpb] -> [bn, bkp] through an MXU dot
    against an iota-built 0/1 expand mask — one [bn, kpg] x [kpg, bkp]
    matmul per block, ~1 us, instead of any per-element gather. The scale
    ref carries the FULL [bn, K/G] strip (a per-K-block scale tile's lane
    would be bkp/g2 ~ 8 — an illegal Mosaic tile; the full strip's lane
    equals the array dim, always legal) and the expand mask selects this
    block's groups via the grid index. The "groupdot" variant is
    structurally unavailable in this layout (the per-group scale column
    would need a sublane->lane transpose); callers get "fused" semantics
    for it.
    """
    kb = pl.program_id(1)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xe = xe_ref[:]  # [M, bkp]
    xo = xo_ref[:]
    b = qp_ref[:]  # [bn, bkp] uint8
    bn, bkp = b.shape
    if kp_total % bkp:
        valid = kp_total - kb * bkp
        xcol = jax.lax.broadcasted_iota(jnp.int32, xe.shape, 1)
        xe = jnp.where(xcol < valid, xe, 0)
        xo = jnp.where(xcol < valid, xo, 0)
    cdt = jnp.float32 if interp else xe.dtype  # see _i4mm_kernel
    prec = _dot_precision(cdt)
    dims = (((1,), (1,)), ((), ()))
    s = s_ref[:].astype(jnp.float32)  # [bn, kpg] FULL scale strip
    kpg = s.shape[1]
    gpb = bkp // g2

    # expand scale along lanes: sexp[n, k] = s[n, kb * gpb + k // g2]
    # (group indices past kpg — possible only in the ragged tail block —
    # match no mask row, so their sexp columns are exactly 0 and the pad
    # weight columns drop out; the x-column mask above covers the rest)
    erow = jax.lax.broadcasted_iota(jnp.int32, (kpg, bkp), 0)
    ecol = jax.lax.broadcasted_iota(jnp.int32, (kpg, bkp), 1)
    emask = (erow == kb * gpb + ecol // g2).astype(jnp.float32)
    sexp = jax.lax.dot_general(
        s, emask, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # [bn, bkp]

    bi = b.astype(jnp.int32)
    if variant == "bittrick":
        lo16 = (jnp.int32(0x4300) | (bi & 0xF)).astype(jnp.uint16)
        hi16 = (jnp.int32(0x4300) | (bi >> 4)).astype(jnp.uint16)
        blo = (jax.lax.bitcast_convert_type(lo16, jnp.bfloat16)
               - jnp.bfloat16(136.0)).astype(jnp.float32)
        bhi = (jax.lax.bitcast_convert_type(hi16, jnp.bfloat16)
               - jnp.bfloat16(136.0)).astype(jnp.float32)
        dlo = (blo * sexp).astype(cdt)
        dhi = (bhi * sexp).astype(cdt)
    else:
        lo, hi = _sx(bi)
        dlo = (lo.astype(jnp.float32) * sexp).astype(cdt)
        dhi = (hi.astype(jnp.float32) * sexp).astype(cdt)
    acc_ref[:] += (
        jax.lax.dot_general(xe.astype(cdt), dlo, dims,
                            preferred_element_type=jnp.float32,
                            precision=prec)
        + jax.lax.dot_general(xo.astype(cdt), dhi, dims,
                              preferred_element_type=jnp.float32,
                              precision=prec)
    )

    @pl.when(kb == k_blocks - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group", "block_n", "block_kp", "interpret", "variant"),
)
def int4_matmul_t(
    x: jnp.ndarray,  # [M, K] bf16/fp32
    q_packed: jnp.ndarray,  # [N, K/2] uint8 nibble pairs
    scale: jnp.ndarray,  # [N, K/G] fp32
    *,
    group: int,
    block_n: int = 512,
    block_kp: int = 512,
    interpret: bool = False,
    variant: str = "fused",
) -> jnp.ndarray:
    """x @ dequant(q_packed, scale)^T; weights stored [out, in] packed."""
    m, k = x.shape
    n, kp = q_packed.shape
    assert k == 2 * kp and group % 2 == 0
    g2 = group // 2
    kpg = k // group
    assert scale.shape == (n, kpg)
    bn = _align_bn(block_n, n)
    bkp = _align_bkp(block_kp, kp, g2, scale_blocked=False)
    k_blocks = pl.cdiv(kp, bkp)
    xe, xo = x[:, 0::2], x[:, 1::2]
    xe, xo, mp = _pad_m(xe, xo, m)
    grid = (pl.cdiv(n, bn), k_blocks)
    out = pl.pallas_call(
        functools.partial(_i4mm_t_kernel, k_blocks=k_blocks, kp_total=kp,
                          g2=g2, variant=variant, interp=interpret),
        grid=grid,
        in_specs=[
            pl.BlockSpec((mp, bkp), lambda j, kb: (0, kb), memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, bkp), lambda j, kb: (0, kb), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bkp), lambda j, kb: (j, kb), memory_space=pltpu.VMEM),
            # full scale strip per N-block (lane = kpg = array dim: legal)
            pl.BlockSpec((bn, kpg), lambda j, kb: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mp, bn), lambda j, kb: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((mp, bn), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=2 * m * kp * x.dtype.itemsize + kp * n
            + n * (k // group) * 4 + m * n * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xe, xo, q_packed, scale)
    return out[:m] if mp != m else out
