"""Distributional equivalence of speculative sampling vs autoregressive.

The canonical guarantee of speculative rejection sampling (reference
self_speculation_generator.py:184-199 + max_fn residual :27-29): the
*distribution* of committed tokens is identical to sampling from the full
model autoregressively, for any draft model. The greedy degeneration is
covered exactly elsewhere (token-stream equality); this file proves the
sampling branch — acceptance test, residual resample, bonus draw, and the
near-``max_steps`` ``w_eff`` clamp — statistically.

Method: one compiled program generates B=N independent rows of the same
prompt (per-row rng streams, engine.py _row_keys), so N samples cost one
dispatch. Empirical per-position marginals of spec vs AR are compared in
total-variation distance against a self-calibrated null: the TV between two
independent AR runs. Seeds are fixed — no flakiness.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax

# The TV-distance statistics need hundreds of sampled rows through several
# compiled programs per test — minutes each. Slow tier only (run with
# `pytest -m slow` / full suite `-m ""`); the greedy bit-exactness that
# gates correctness lives in the fast tier (test_generation,
# test_reference_equivalence, test_draft_quant).
pytestmark = __import__("pytest").mark.slow

from layerskip_tpu.config import GenerationConfig, tiny_config
from layerskip_tpu.generation.engine import Engine
from layerskip_tpu.models.params import init_params

N = 2048  # rows per run (= samples per position)
PROMPT = [3, 141, 59, 26, 5]

# The tree-speculation programs are the largest XLA compiles in the suite,
# and this jaxlib's CPU compiler sporadically dies (SIGSEGV in
# backend_compile_and_load, once SIGABRT in the cache serializer) when they
# compile late in a long-lived process that already holds hundreds of
# executables — observed twice across full-suite runs, never when the file
# runs alone. Workaround: run each tree test in a FRESH interpreter via an
# inner pytest, retrying once on a crash signal. A real assertion failure
# inside the subprocess still fails the outer test (non-signal rc, no
# retry), so coverage is unchanged — only the compiler flake is contained.
_INNER = os.environ.get("LAYERSKIP_STAT_INNER") == "1"
_CRASH_RCS = (-11, -6, 134, 139)


def _run_isolated(name: str) -> bool:
    """True -> the body already ran (in a subprocess); False -> run inline."""
    if _INNER:
        return False
    env = dict(os.environ, LAYERSKIP_STAT_INNER="1")
    for attempt in (1, 2):
        r = subprocess.run(
            # "-m ''" overrides the default addopts marker filter
            # (-m 'not slow'): this whole file is slow-tier, and without
            # the override the inner pytest would deselect the very test
            # it was spawned to run (rc=5, no tests collected). "-n 0"
            # disables xdist for the single-test inner run.
            [sys.executable, "-m", "pytest", "-q", "-x", "-m", "", "-n", "0",
             f"{os.path.abspath(__file__)}::{name}"],
            env=env, capture_output=True, timeout=1500,
        )
        if r.returncode == 0:
            return True
        crashed = r.returncode in _CRASH_RCS
        if crashed and attempt == 1:
            continue
        tail = (r.stdout.decode(errors="replace")[-1500:]
                + r.stderr.decode(errors="replace")[-500:])
        raise AssertionError(
            f"isolated {name} failed (rc={r.returncode}, "
            f"attempt {attempt}):\n{tail}"
        )
    return True


@pytest.fixture(scope="module")
def engine():
    cfg = tiny_config()
    params = init_params(jax.random.PRNGKey(11), cfg)
    return Engine(params, cfg)


def _marginals(engine, gen_cfg, seed, positions, vocab):
    """Empirical token distribution at each position over N parallel rows.

    EOS is pointed at an unreachable id so no row stops early — the marginal
    at every tested position then has the full N samples."""
    out = engine.generate(
        [PROMPT] * N, gen_cfg, jax.random.PRNGKey(seed), eos_ids=(vocab + 7,)
    )
    toks = np.asarray(out.tokens)
    counts = np.asarray(out.num_tokens)
    dists = {}
    for j in positions:
        valid = counts > j
        assert valid.mean() > 0.9, f"too few rows reach position {j}"
        hist = np.bincount(toks[valid, j], minlength=vocab).astype(np.float64)
        dists[j] = hist / hist.sum()
    return dists


def _tv(p, q):
    return 0.5 * float(np.abs(p - q).sum())


def _check_equivalence(engine, scfg_kwargs, max_steps, exit_layer=2, spec=4,
                       strategy="self_speculative", **gen_kwargs):
    """spec-vs-AR TV must be within noise of the AR-vs-AR null."""
    v = engine.cfg.vocab_size
    positions = [0, max_steps // 2, max_steps - 1]
    common = dict(max_steps=max_steps, sample=True, **scfg_kwargs)
    ar_cfg = GenerationConfig(
        generation_strategy="autoregressive", exit_layer=-1, **common
    )
    sp_cfg = GenerationConfig(
        generation_strategy=strategy, exit_layer=exit_layer,
        num_speculations=spec, pld_ngram=2, **common, **gen_kwargs
    )
    ar1 = _marginals(engine, ar_cfg, 0, positions, v)
    ar2 = _marginals(engine, ar_cfg, 1, positions, v)
    sp = _marginals(engine, sp_cfg, 2, positions, v)
    for j in positions:
        null = _tv(ar1[j], ar2[j])  # pure sampling noise at this position
        got = _tv(ar1[j], sp[j])
        # 1.5x null + slack: catches systematic bias, tolerates noise
        assert got < 1.5 * null + 0.05, (
            f"position {j}: TV(ar, spec)={got:.4f} vs null TV(ar, ar')="
            f"{null:.4f}"
        )


def test_spec_sampling_matches_ar_distribution(engine):
    """Temperature-only sampling: full-support distributions, residual
    resamples happen constantly on a random model (acceptance well below 1)."""
    _check_equivalence(
        engine, dict(temperature=0.9, top_k=0, top_p=1.0), max_steps=12
    )


def test_spec_sampling_matches_ar_with_warpers(engine):
    """top-k/top-p filtered sampling — the HF-warper-equivalent path."""
    _check_equivalence(
        engine, dict(temperature=0.7, top_k=20, top_p=0.9), max_steps=12
    )


def test_spec_sampling_clamp_branch(engine):
    """max_steps barely above W forces w_eff < W rounds (engine.py w_eff
    clamp): the final committed positions must still be AR-distributed."""
    _check_equivalence(
        engine, dict(temperature=0.9, top_k=0, top_p=0.95), max_steps=6,
        exit_layer=2, spec=4,
    )


def test_spec_acceptance_below_one_on_random_model(engine):
    """Sanity: the tests above actually exercise rejections (a random
    model's draft and verify distributions differ)."""
    sp_cfg = GenerationConfig(
        generation_strategy="self_speculative", exit_layer=2,
        num_speculations=4, max_steps=12, sample=True, temperature=0.9,
        top_k=0, top_p=1.0,
    )
    out = engine.generate([PROMPT] * 64, sp_cfg, jax.random.PRNGKey(5))
    acc = float(int(out.matches)) / max(int(out.drafts), 1)
    assert 0.0 < acc < 0.95, acc


def test_pld_sampling_matches_ar_distribution(engine):
    """Prompt-lookup drafting under sampling: the draft distributions are
    one-hot, so rejection sampling must still commit AR-distributed tokens
    (accept with p_verify(d), else sample the residual — which for a
    one-hot q is the renormalized remainder of p_verify)."""
    _check_equivalence(
        engine, dict(temperature=0.9, top_k=0, top_p=1.0), max_steps=12,
        strategy="prompt_lookup",
    )


def test_tree_sampling_matches_ar_distribution(engine):
    """Multi-candidate (tree) speculative SAMPLING: the branch position runs
    SpecInfer-style multi-round rejection over k i.i.d. draft candidates
    (engine.py::_tree_round) — committed tokens must still be
    AR-distributed at every position."""
    if _run_isolated("test_tree_sampling_matches_ar_distribution"):
        return
    _check_equivalence(
        engine, dict(temperature=0.9, top_k=0, top_p=1.0), max_steps=12,
        spec_tree_width=3,
    )


def test_tree_sampling_matches_ar_with_warpers(engine):
    """Tree sampling under top-k/top-p warping (candidates and targets both
    drawn from the warped distributions)."""
    if _run_isolated("test_tree_sampling_matches_ar_with_warpers"):
        return
    _check_equivalence(
        engine, dict(temperature=0.7, top_k=20, top_p=0.9), max_steps=12,
        spec_tree_width=2,
    )


def test_tree_sampling_clamp_branch(engine):
    """Tree sampling with max_steps barely above W (w_eff clamp => bonus
    draws instead of true rejections at the tail)."""
    if _run_isolated("test_tree_sampling_clamp_branch"):
        return
    _check_equivalence(
        engine, dict(temperature=0.9, top_k=0, top_p=0.95), max_steps=6,
        spec_tree_width=3,
    )
