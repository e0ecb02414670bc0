"""On-device token sampling: greedy + temperature / top-k / top-p.

TPU-native counterpart of the reference's ``decode_next_token`` +
``top_k_top_p_filtering`` (self_speculation/llama_model_utils.py:75-131),
which wrap HF ``TopKLogitsWarper``/``TopPLogitsWarper`` and
``torch.multinomial``. Here everything is pure jnp / ``jax.random`` so it
lives *inside* the jitted generation loop — no per-token host syncs
(the reference does a ``.item()`` per draft token,
self_speculation_generator.py:141).

Design note: greedy decoding is expressed as a *one-hot distribution* so the
speculative acceptance rule (rejection sampling) degenerates exactly to
longest-prefix token match — one code path serves both modes
(reference splits them at self_speculation_generator.py:186-199).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    """Static sampling knobs (subset of GenerationConfig; all jit-static)."""

    sample: bool = True
    temperature: float = 0.6
    top_k: int = 0
    top_p: float = 0.9


def top_k_top_p_filter(
    logits: jnp.ndarray, top_k: int, top_p: float
) -> jnp.ndarray:
    """Additive-mask filtering of [..., V] fp32 logits.

    Matches HF warper semantics (reference llama_model_utils.py:97-105):
    top-k first, then nucleus; the token that crosses the ``top_p`` mass
    boundary is kept (min_tokens_to_keep=1 falls out for free since the
    first sorted token always has zero preceding mass).
    """
    v = logits.shape[-1]
    if top_k and 0 < top_k < v:
        kth = jnp.sort(logits, axis=-1)[..., v - top_k][..., None]
        logits = jnp.where(logits < kth, NEG_INF, logits)
    if 0.0 < top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]  # descending
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1) - probs  # mass strictly before each
        keep_sorted = cum < top_p
        # threshold logit = smallest kept logit
        num_keep = jnp.sum(keep_sorted, axis=-1, keepdims=True)  # >= 1
        thresh = jnp.take_along_axis(sorted_logits, num_keep - 1, axis=-1)
        logits = jnp.where(logits < thresh, NEG_INF, logits)
    return logits


def token_distribution(logits: jnp.ndarray, scfg: SamplingConfig) -> jnp.ndarray:
    """[..., V] fp32 logits -> the distribution tokens are drawn from.

    Greedy => one-hot(argmax); sampling => softmax of temperature-scaled,
    top-k/top-p-filtered logits. This is the ``p`` used both for drawing
    tokens and for speculative rejection sampling, mirroring the reference
    which records per-draft-token distributions when sampling
    (self_speculation_generator.py:143-144).
    """
    logits = logits.astype(jnp.float32)
    if not scfg.sample:
        return jax.nn.one_hot(
            jnp.argmax(logits, axis=-1), logits.shape[-1], dtype=jnp.float32
        )
    t = max(scfg.temperature, 1e-5)
    logits = top_k_top_p_filter(logits / t, scfg.top_k, scfg.top_p)
    return jax.nn.softmax(logits, axis=-1)


def draw(probs: jnp.ndarray, rng: jax.Array, scfg: SamplingConfig) -> jnp.ndarray:
    """Draw token ids from [..., V] probabilities (argmax when greedy).

    ``rng`` may be a single key or per-row keys [B, 2] matching probs'
    leading axis — each batch row then samples from an independent stream
    (reproducible per-request sampling in batched serving).
    """
    if not scfg.sample:
        return jnp.argmax(probs, axis=-1).astype(jnp.int32)
    logp = jnp.log(probs + 1e-30)
    if rng.ndim == 2 and probs.ndim >= 2 and rng.shape[0] == probs.shape[0]:
        return jax.vmap(
            lambda k, lp: jax.random.categorical(k, lp, axis=-1)
        )(rng, logp).astype(jnp.int32)
    return jax.random.categorical(rng, logp, axis=-1).astype(jnp.int32)


def sample_token(
    logits: jnp.ndarray, rng: jax.Array, scfg: SamplingConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Counterpart of reference ``decode_next_token`` (llama_model_utils.py:109-131).

    Returns ``(token_ids, probs)`` where ``probs`` is the full distribution
    the token was drawn from (needed by speculative acceptance).
    """
    probs = token_distribution(logits, scfg)
    return draw(probs, rng, scfg), probs
