"""Weight application: dense bf16 or int8-quantized matmul.

``apply_weight(x, w)`` is the single projection primitive the Llama forward
uses for q/k/v/o and MLP matmuls; ``w`` is either a plain [K, N] array or a
``QuantTensor`` (int8 + per-channel scales — layerskip_tpu/quant.py). On TPU
the quantized path runs the Pallas fused dequant-matmul
(ops/pallas/quant_matmul.py); elsewhere it dequantizes and lets XLA matmul.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from flax import struct


def pack_int4(q: jnp.ndarray, k_last: bool = False) -> jnp.ndarray:
    """Pack int4 values (any int dtype, range [-8, 7]) two-per-byte along K.

    S4 arrays cannot cross a jit boundary on the axon TPU backend: any
    ``device_put``/relayout of an S4 argument re-enters jit and recurses
    (RecursionError, measured on jax 0.9.0 / v5e — even eager device_put
    fails). int4 weights therefore live as uint8 nibble pairs — identical
    HBM bytes to XLA's native S4 packing — and are unpacked by
    ``unpack_int4`` *inside* the consuming program, where the elementwise
    shift/convert chain fuses into the matmul's operand read.

    Byte ``b`` at packed K-index ``i`` holds element ``2i`` in its low
    nibble and ``2i+1`` in its high nibble, OFFSET-BINARY (``u = q + 8``,
    so stored nibbles are unsigned 0..15). Offset binary rather than two's
    complement because the sign offset then factors out of a matmul as a
    rank-1 term: ``x @ (u - 8) == x @ u - 8 * row_sums(x)`` — which is what
    the Pallas "groupdot" kernel variant (ops/pallas/quant_matmul.py)
    exploits to dot raw unsigned nibbles. (Same trick as AWQ-style
    unsigned-with-zero-point storage.) The shipping "fused" variant decodes
    with mask/shift/subtract-8 instead — groupdot lost the v5e A/B (see the
    post-mortem in quant_matmul.py) — but the storage format serves both
    and needs no sign-extension ops anywhere.
    """
    axis = -1 if k_last else -2
    k = q.shape[axis]
    assert k % 2 == 0, f"int4 packing needs even K, got {k}"
    qn = (jnp.asarray(q, jnp.int32) + 8) & 0xF
    lo = jax.lax.slice_in_dim(qn, 0, k, 2, axis=q.ndim + axis)
    hi = jax.lax.slice_in_dim(qn, 1, k, 2, axis=q.ndim + axis)
    return (lo | (hi << 4)).astype(jnp.uint8)


def unpack_int4(p: jnp.ndarray, k_last: bool = False) -> jnp.ndarray:
    """Inverse of ``pack_int4``: uint8 nibble pairs -> int8 values in [-8, 7].

    Offset-binary decode: mask/shift the unsigned nibble (logical shift on
    uint8), subtract 8. The interleave is a stack+reshape along K.
    """
    lo = (p & 0xF).astype(jnp.int8) - 8
    hi = (p >> 4).astype(jnp.int8) - 8
    if k_last:  # [..., N, K/2] -> [..., N, K]
        st = jnp.stack([lo, hi], axis=-1)
        return st.reshape(*p.shape[:-1], p.shape[-1] * 2)
    st = jnp.stack([lo, hi], axis=-2)  # [..., K/2, 2, N]
    return st.reshape(*p.shape[:-2], p.shape[-2] * 2, p.shape[-1])


@struct.dataclass
class QuantTensor:
    """Quantized weights + fp32 scales (int8 per-channel or int4 groupwise).

    ``group == 0`` (int8, per-output-channel): q [..., K, N] int8 (or
    [..., N, K] when ``k_last``), scale [..., N] fp32.

    ``group == G > 0`` (int4, K-groupwise — per-channel int4 loses too much
    signal, so scales live per (G-long contraction slice, output channel)):
    q is nibble-PACKED uint8 [..., K/2, N] (``k_last``: [..., N, K/2]) —
    see ``pack_int4`` for why not jnp.int4 — with scale [..., K/G, N]
    (``k_last``: [..., N, K/G]). Decode weight traffic halves again over
    int8.

    Lives as a pytree node inside LlamaParams, so layer stacking/slicing/
    scan all work unchanged. ``k_last`` mirrors the dense orientation split:
    attention input projections are stored [out, in] (see apply_weight_t).
    """

    q: jnp.ndarray
    scale: jnp.ndarray
    k_last: bool = struct.field(pytree_node=False, default=False)
    group: int = struct.field(pytree_node=False, default=0)

    @property
    def shape(self):
        """LOGICAL (dense-equivalent) shape — unpacked K for int4."""
        if self.group:
            ax = -1 if self.k_last else -2
            s = list(self.q.shape)
            s[ax] *= 2
            return tuple(s)
        return self.q.shape

    @property
    def ndim(self):
        return self.q.ndim

    def __getitem__(self, idx) -> "QuantTensor":
        return QuantTensor(q=self.q[idx], scale=self.scale[idx],
                           k_last=self.k_last, group=self.group)

    def dequantize(self, dtype=jnp.bfloat16) -> jnp.ndarray:
        if self.group:
            g = self.group
            qf = unpack_int4(self.q, self.k_last).astype(jnp.float32)
            if self.k_last:  # [..., N, K], scale [..., N, K/G]
                *lead, n, k = qf.shape
                wf = qf.reshape(*lead, n, k // g, g) * self.scale[..., None]
                return wf.reshape(*lead, n, k).astype(dtype)
            *lead, k, n = qf.shape
            wf = (qf.reshape(*lead, k // g, g, n)
                  * self.scale[..., :, None, :])
            return wf.reshape(*lead, k, n).astype(dtype)
        if self.k_last:  # [..., N, K] * scale[..., N, 1]
            return (self.q.astype(jnp.float32) * self.scale[..., :, None]).astype(dtype)
        return (self.q.astype(jnp.float32) * self.scale[..., None, :]).astype(dtype)


_PALLAS_QMM_MIN_M = 256  # below this, XLA's fused dequant-matmul wins:
# the dequant multiply fuses into the dot so int8 bytes are read once, and
# tiny-M Pallas blocks (padded to 8 sublanes) waste the MXU (measured at 1B)


def _use_pallas_qmm(m: int) -> bool:
    return (
        jax.default_backend() == "tpu"
        and m >= _PALLAS_QMM_MIN_M
        and os.environ.get("LAYERSKIP_TPU_DISABLE_PALLAS") != "1"
    )


_PALLAS_I4MM_MAX_M = 64  # int4 is the OPPOSITE regime of int8: XLA cannot
# keep the groupwise dequant off the critical path at any M (split-K XLA
# measures 1.71 ms at 7B-MLP shape vs the Pallas fused kernel's 1.36 ms —
# in-kernel nibble unpack, packed bytes stream HBM->VMEM once), so the
# Pallas kernel owns decode-sized M. Above this, prefill-sized M makes the
# one-off XLA dequant materialization amortize and the whole-block MXU dot
# win; the kernel also keeps all of M in one block, so huge M would blow
# VMEM.


def _use_pallas_i4mm(m: int, k: int, group: int) -> bool:
    return (
        jax.default_backend() == "tpu"
        and m <= _PALLAS_I4MM_MAX_M
        and group % 2 == 0
        and (k // 2) % (group // 2) == 0
        and os.environ.get("LAYERSKIP_TPU_DISABLE_PALLAS") != "1"
        and os.environ.get("LAYERSKIP_INT4_XLA") != "1"  # A/B escape hatch
    )


def _qdot(x2: jnp.ndarray, w: QuantTensor) -> jnp.ndarray:
    """[M, K] @ int8 weights with the scale applied AFTER the contraction.

    The per-output-channel scale is constant along K, so
    ``x @ (q * scale)  ==  (x @ q) * scale`` exactly. The second form keeps
    the dot's weight operand a pure int8->x.dtype convert — an elementwise
    cast XLA reliably fuses into the operand read (int8 bytes stream from
    HBM once) — instead of a convert+multiply whose fusion into the
    contraction is at the compiler's mercy (the round-2 int8 decode path
    measured ~61% of the bytes-halving roofline vs bf16's 81%; this
    reformulation is the candidate fix). Numerics strictly improve: int8
    magnitudes are exact in bf16, so nothing is rounded before the MXU, and
    the scale lands on the fp32 accumulator.
    """
    dims = (((1,), (1,) if w.k_last else (0,)), ((), ()))
    if w.group:
        # Groupwise int4, SPLIT-K: the nibble interleave (stack+reshape
        # along K) is data movement XLA cannot fuse into a dot operand —
        # dequantized weights re-materialized in HBM every step (measured
        # 4.36 tok/s 7B AR, 11x slower than bf16). Instead contract the
        # even-K and odd-K halves separately: each dot's weight operand is
        # a pure shift->convert->scale elementwise chain over the packed
        # bytes (fuses like the int8 convert does; packed bytes stream
        # from HBM once), and the strided even/odd slicing lands on the
        # tiny activation. Groupwise scales survive the split because G/2
        # packed bytes per group hold exactly the group's even (lo) and
        # odd (hi) elements: scale group i covers packed rows
        # [i*G/2, (i+1)*G/2).
        assert w.group % 2 == 0, "split-K int4 needs an even group size"
        g2 = w.group // 2
        b = w.q  # uint8, offset-binary nibbles (see pack_int4)
        lo = (b & 0xF).astype(jnp.float32) - 8.0
        hi = (b >> 4).astype(jnp.float32) - 8.0
        s = w.scale
        if w.k_last:  # q [N, K/2], scale [N, K/G]
            n, k2 = b.shape
            dlo = (lo.reshape(n, k2 // g2, g2) * s[..., None]
                   ).reshape(n, k2).astype(x2.dtype)
            dhi = (hi.reshape(n, k2 // g2, g2) * s[..., None]
                   ).reshape(n, k2).astype(x2.dtype)
        else:  # q [K/2, N], scale [K/G, N]
            k2, n = b.shape
            dlo = (lo.reshape(k2 // g2, g2, n) * s[:, None, :]
                   ).reshape(k2, n).astype(x2.dtype)
            dhi = (hi.reshape(k2 // g2, g2, n) * s[:, None, :]
                   ).reshape(k2, n).astype(x2.dtype)
        return (jax.lax.dot_general(x2[:, 0::2], dlo, dims)
                + jax.lax.dot_general(x2[:, 1::2], dhi, dims))
    if os.environ.get("LAYERSKIP_INT8_PRESCALE") == "1":
        # A/B escape hatch (trace-time static): the pre-round-2 formulation
        # that multiplied the scale into the dot operand — flip this flag
        # on-chip to quantify the post-contraction-scale win without a
        # git revert (scripts/onchip_queue.py int8 items).
        return jax.lax.dot_general(x2, w.dequantize(x2.dtype), dims)
    acc = jax.lax.dot_general(
        x2, w.q.astype(x2.dtype), dims, preferred_element_type=jnp.float32
    )
    return (acc * w.scale).astype(x2.dtype)


def apply_weight(x: jnp.ndarray, w) -> jnp.ndarray:
    """x [..., K] @ w [K, N] -> [..., N]; w may be dense or QuantTensor."""
    if isinstance(w, QuantTensor):
        assert w.q.ndim == 2, "apply_weight expects a single layer's weight"
        assert not w.k_last, "k_last QuantTensor goes through apply_weight_t"
        lead = x.shape[:-1]
        k = x.shape[-1]
        x2 = x.reshape(-1, k)
        if w.group == 0 and _use_pallas_qmm(x2.shape[0]):
            from layerskip_tpu.ops.pallas.quant_matmul import quant_matmul

            out = quant_matmul(x2, w.q, w.scale)
        elif w.group and _use_pallas_i4mm(x2.shape[0], k, w.group):
            from layerskip_tpu.ops.pallas.quant_matmul import int4_matmul

            out = int4_matmul(x2, w.q, w.scale, group=w.group)
        else:
            out = _qdot(x2, w)
        return out.reshape(*lead, -1)
    return x @ w


def apply_weight_t(x: jnp.ndarray, w) -> jnp.ndarray:
    """x [..., K] @ w^T where w is stored [N, K] (HF [out, in] orientation).

    Attention input projections (wq/wk/wv) keep this orientation: on TPU,
    XLA's layout assignment wants them K-minor inside decode loops, and
    storing them [N, K] (default layout == K-minor) avoids GB-scale
    whole-stack relayout copies in the self-speculative while-program
    (measured: 6 GiB of copies -> 0 at 7B).
    """
    if isinstance(w, QuantTensor):
        assert w.q.ndim == 2 and w.k_last
        lead = x.shape[:-1]
        k = x.shape[-1]
        x2 = x.reshape(-1, k)
        if w.group == 0 and _use_pallas_qmm(x2.shape[0]):
            from layerskip_tpu.ops.pallas.quant_matmul import quant_matmul_t

            out = quant_matmul_t(x2, w.q, w.scale)
        elif w.group and _use_pallas_i4mm(x2.shape[0], k, w.group):
            from layerskip_tpu.ops.pallas.quant_matmul import int4_matmul_t

            out = int4_matmul_t(x2, w.q, w.scale, group=w.group)
        else:
            out = _qdot(x2, w)
        return out.reshape(*lead, -1)
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (w.ndim - 1,)), ((), ())),
    )
