"""EleutherAI lm-eval-harness adapter + eval CLI.

Counterpart of the reference's ``eval.py`` (eval.py:67-449): an
``EvalHarnessLM`` wrapper that routes *generation* tasks through the custom
(self-speculative) generator and *loglikelihood* tasks through a plain
full-forward logits path (the reference likewise bypasses its custom engine
for loglikelihood, calling the raw model at eval.py:277-279).

``lm_eval`` is not bundled in this container; the adapter imports it lazily
and the scoring core (``loglikelihood_tokens``) is usable and tested without
it.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from layerskip_tpu.cli.args import Arguments, parse_dataclasses
from layerskip_tpu.cli.loading import load_model_and_tokenizer
from layerskip_tpu.config import GenerationConfig, ModelConfig
from layerskip_tpu.generation.generator import LlamaGenerator
from layerskip_tpu.models import llama
from layerskip_tpu.models.llama import LlamaParams
from layerskip_tpu.ops.kv_cache import init_kv_cache

log = logging.getLogger(__name__)


@dataclasses.dataclass
class EvalArguments:
    """reference: eval.py:32-55 (subset actually consumed)."""

    tasks: Optional[str] = None
    num_fewshot: int = 0
    limit: Optional[int] = None
    batch_size: int = 1
    use_cache: Optional[str] = None
    log_samples: bool = False


class TokenScorer:
    """Full-forward logprob scoring with prompt-length bucketing.

    The loglikelihood path of the reference calls the raw HF model on
    right-padded batches (eval.py:241-296); here it is a jitted prefill
    per bucket with fp32 log-softmax on the host side.
    """

    def __init__(self, params: LlamaParams, cfg: ModelConfig):
        self.params = params
        self.cfg = cfg
        self._cache = {}  # per-instance (lru_cache on methods would leak self)

    def _compiled(self, bucket: int):
        if bucket in self._cache:
            return self._cache[bucket]

        def fn(params, ids):
            cache = init_kv_cache(self.cfg, batch=ids.shape[0], max_len=bucket)
            res = llama.forward(params, self.cfg, ids, cache, jnp.int32(0))
            return jax.nn.log_softmax(res.logits, axis=-1)

        self._cache[bucket] = jax.jit(fn)
        return self._cache[bucket]

    def logprobs(self, token_ids: List[int]) -> np.ndarray:
        """[T, V] fp32 log-probs for one sequence (position t predicts t+1)."""
        from layerskip_tpu.generation.engine import _bucket

        t = len(token_ids)
        bucket = _bucket(t)
        ids = np.zeros((1, bucket), np.int32)
        ids[0, :t] = token_ids
        lp = self._compiled(bucket)(self.params, jnp.asarray(ids))
        return np.asarray(lp[0, :t])

    def loglikelihood_tokens(
        self, context: List[int], continuation: List[int]
    ) -> Tuple[float, bool]:
        """(sum logprob of continuation, greedy exact-match) — the contract of
        lm-eval's ``_loglikelihood_tokens`` rows (reference eval.py:165-296)."""
        assert continuation, "empty continuation"
        full = list(context) + list(continuation)
        lp = self.logprobs(full[:-1] if len(full) > 1 else full)
        start = max(len(context) - 1, 0)
        ll = 0.0
        greedy = True
        for i, tok in enumerate(continuation):
            row = lp[start + i]
            ll += float(row[tok])
            greedy = greedy and int(row.argmax()) == int(tok)
        return ll, greedy


class EvalHarnessLM:
    """lm-eval ``TemplateLM``-compatible wrapper (reference eval.py:67-392).

    Constructed as an adapter over (generator, scorer); inherits TemplateLM
    lazily so the module imports without lm_eval installed.
    """

    def __new__(cls, *a, **kw):
        try:
            from lm_eval.api.model import TemplateLM

            cls = type("EvalHarnessLM", (cls, TemplateLM), {})
        except ImportError:
            pass
        return object.__new__(cls)

    def __init__(self, generator: LlamaGenerator, generation_config: GenerationConfig):
        self.generator = generator
        self.generation_config = generation_config
        self.scorer = TokenScorer(generator.engine.params, generator.cfg)
        self.tokenizer = generator.tokenizer

    # --- TemplateLM API ---

    @property
    def eot_token_id(self):
        return self.generator.eos_ids[0]

    def tok_encode(self, string: str, **kw) -> List[int]:
        return self.generator._encode(string)

    def generate_until(self, requests, disable_tqdm: bool = False) -> List[str]:
        """reference: eval.py:92-115 — generate then apply stop strings."""
        out = []
        for req in requests:
            prompt, gen_args = req.args
            until = gen_args.get("until", [])
            result = self.generator.generate(prompt, self.generation_config)
            text = result.decoded_prediction
            for stop in until:
                if stop and stop in text:
                    text = text.split(stop)[0]
            out.append(text)
        return out

    def _loglikelihood_tokens(self, requests, disable_tqdm: bool = False):
        """reference: eval.py:117-296 (batch_size==1, eval.py:82)."""
        res = []
        for req in requests:
            _key, context_enc, continuation_enc = (
                req.args if hasattr(req, "args") else req
            )
            res.append(self.scorer.loglikelihood_tokens(context_enc, continuation_enc))
        return res

    def loglikelihood_rolling(self, requests, disable_tqdm: bool = False):
        """reference: eval.py:298-365 — full-text LM loss via rolling windows."""
        out = []
        max_len = self.generator.cfg.max_position_embeddings
        for req in requests:
            (string,) = req.args if hasattr(req, "args") else (req,)
            toks = self.tok_encode(string)
            ll = 0.0
            # windows of at most max_len, BOS-less rolling as in lm-eval
            for s in range(0, len(toks), max_len - 1):
                window = toks[s : s + max_len]
                if len(window) < 2:
                    break
                w_ll, _ = self.scorer.loglikelihood_tokens(window[:1], window[1:])
                ll += w_ll
            out.append(ll)
        return out


def main(args: Arguments, eval_args: EvalArguments, gen_cfg: GenerationConfig):
    try:
        import lm_eval
    except ImportError as e:
        raise SystemExit(
            "lm_eval is not installed in this container; the EvalHarnessLM "
            "adapter and TokenScorer are importable and tested standalone "
            "(tests/test_eval_adapter.py)"
        ) from e

    assert eval_args.batch_size == 1, "batch_size must be 1"  # eval.py:82
    params, cfg, tokenizer = load_model_and_tokenizer(args.model, seed=args.seed, dp=args.dp, tp=args.tp)
    generator = LlamaGenerator(tokenizer, params, cfg)
    wrap = EvalHarnessLM(generator, gen_cfg)
    results = lm_eval.simple_evaluate(
        wrap,
        tasks=(eval_args.tasks or "").split(","),
        num_fewshot=eval_args.num_fewshot,
        limit=eval_args.limit,
        log_samples=eval_args.log_samples,
    )
    os.makedirs(args.output_dir, exist_ok=True)
    out_path = os.path.join(args.output_dir, f"eval_{int(time.time())}.json")
    with open(out_path, "w") as f:
        json.dump(results.get("results", results), f, indent=2, default=str)
    print(json.dumps(results.get("results", {}), indent=2, default=str))
    return results


if __name__ == "__main__":
    a, e, c = parse_dataclasses((Arguments, EvalArguments, GenerationConfig))
    main(a, e, c)
