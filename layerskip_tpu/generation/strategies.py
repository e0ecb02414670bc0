"""Strategy classes mirroring the reference API surface.

The reference exposes ``GenerationStrategy`` (ABC),
``AutoRegressiveGenerationStrategy`` and ``SelfSpeculativeGenerationStrategy``
(generator_base.py:51-62, autoregressive_generator.py:25,
self_speculation_generator.py:31). In this framework both strategies are
jitted whole-generation programs selected by
``GenerationConfig.generation_strategy``; these thin classes exist so code
written against the reference's class-based API ports one-to-one.
"""

from __future__ import annotations

import abc
import dataclasses
from typing import List, Optional, Sequence

import jax

from layerskip_tpu.config import GenerationConfig
from layerskip_tpu.generation.engine import Engine, postprocess_output
from layerskip_tpu.generation.generator import GenerationStrategyResult


class GenerationStrategy(abc.ABC):
    """reference: generator_base.py:51-62."""

    strategy_name: str = ""

    @abc.abstractmethod
    def generate_token_ids(
        self,
        engine: Engine,
        input_ids: List[int],
        eos_token_ids: Sequence[int],
        generation_config: GenerationConfig,
        rng: Optional[jax.Array] = None,
        streamer=None,
    ) -> GenerationStrategyResult:
        ...

    def _run(
        self, engine, input_ids, eos_token_ids, generation_config, rng, streamer
    ) -> GenerationStrategyResult:
        cfg = dataclasses.replace(
            generation_config, generation_strategy=self.strategy_name
        )
        out = engine.generate(input_ids, cfg, rng, eos_token_ids)
        tokens = postprocess_output(out, eos_token_ids, cfg.max_steps)
        if streamer is not None:
            import jax.numpy as jnp

            streamer.put(jnp.asarray(tokens))
        acceptance = None
        if self.strategy_name in ("self_speculative", "prompt_lookup", "hybrid"):
            acceptance = float(int(out.matches)) / max(int(out.drafts), 1)
        return GenerationStrategyResult(
            predicted_tokens=tokens, acceptance_rate=acceptance
        )


class AutoRegressiveGenerationStrategy(GenerationStrategy):
    """reference: autoregressive_generator.py:25 (incl. early-exit AR when
    ``exit_layer > 0``)."""

    strategy_name = "autoregressive"

    def generate_token_ids(
        self, engine, input_ids, eos_token_ids, generation_config,
        rng=None, streamer=None,
    ) -> GenerationStrategyResult:
        return self._run(
            engine, input_ids, eos_token_ids, generation_config, rng, streamer
        )


class SelfSpeculativeGenerationStrategy(GenerationStrategy):
    """reference: self_speculation_generator.py:31."""

    strategy_name = "self_speculative"

    def generate_token_ids(
        self, engine, input_ids, eos_token_ids, generation_config,
        rng=None, streamer=None,
    ) -> GenerationStrategyResult:
        return self._run(
            engine, input_ids, eos_token_ids, generation_config, rng, streamer
        )


class PromptLookupGenerationStrategy(GenerationStrategy):
    """Net-new (no reference counterpart): n-gram drafts copied from the
    context, verified through the full model — zero draft-model calls
    (``GenerationConfig.pld_ngram`` sets the match length)."""

    strategy_name = "prompt_lookup"

    def generate_token_ids(
        self, engine, input_ids, eos_token_ids, generation_config,
        rng=None, streamer=None,
    ) -> GenerationStrategyResult:
        return self._run(
            engine, input_ids, eos_token_ids, generation_config, rng, streamer
        )


class HybridGenerationStrategy(GenerationStrategy):
    """Net-new (no reference counterpart): per-round draft-source selection.
    Rounds whose committed suffix has an earlier n-gram occurrence draft for
    free via prompt lookup (skipping every early-layer draft pass); the rest
    draft with the early-exit model. Uses ``exit_layer``,
    ``num_speculations`` and ``pld_ngram``."""

    strategy_name = "hybrid"

    def generate_token_ids(
        self, engine, input_ids, eos_token_ids, generation_config,
        rng=None, streamer=None,
    ) -> GenerationStrategyResult:
        return self._run(
            engine, input_ids, eos_token_ids, generation_config, rng, streamer
        )
