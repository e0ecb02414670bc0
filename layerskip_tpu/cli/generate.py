"""Interactive generation REPL.

Counterpart of the reference's ``generate.py`` (generate.py:69-142): read
prompts from stdin until Ctrl-D, generate with the chosen strategy, print
timing/acceptance stats. Streamer choices none/standard/speculative mirror
generate.py:32-39,75-84; the speculative streamer paints drafts and repaints
accepted tokens via ``Engine.stream_generate``'s per-round callback.

Usage:
  python -m layerskip_tpu.cli.generate --model <dir|random:preset> \
      --generation_strategy self_speculative --exit_layer 8 --num_speculations 6
"""

from __future__ import annotations

import dataclasses
import sys

import jax

from layerskip_tpu.cli.args import Arguments, parse_dataclasses
from layerskip_tpu.cli.loading import load_model_and_tokenizer
from layerskip_tpu.config import GenerationConfig
from layerskip_tpu.generation.engine import postprocess_output
from layerskip_tpu.generation.generator import LlamaGenerator
from layerskip_tpu.generation.streamer import SpeculativeTextStreamer, TextStreamer


@dataclasses.dataclass
class GenerateArguments:
    """reference: generate.py:32-39 (+ chat templating extension)."""

    streamer: str = "none"  # none | standard | speculative
    chat: bool = False  # wrap prompts with the tokenizer's chat template
    warmup: bool = True  # compile + warm the generation program pre-REPL


def _apply_chat_template(tokenizer, user_message: str) -> str:
    """Wrap a raw message with the model's chat template when available."""
    if hasattr(tokenizer, "apply_chat_template"):
        try:
            return tokenizer.apply_chat_template(
                [{"role": "user", "content": user_message}],
                tokenize=False, add_generation_prompt=True,
            )
        except Exception:
            pass
    return user_message


def main(args: Arguments, gen_args: GenerateArguments, gen_cfg: GenerationConfig):
    params, cfg, tokenizer = load_model_and_tokenizer(args.model, seed=args.seed, dp=args.dp, tp=args.tp, quantize=args.quantize)
    generator = LlamaGenerator(tokenizer, params, cfg)

    use_spec_stream = (
        gen_args.streamer == "speculative"
        and gen_cfg.generation_strategy == "self_speculative"
    )
    if gen_args.warmup:
        # Warm up before the first prompt (reference generate.py:100-104):
        # compiles the generation program for the smallest prompt bucket and
        # publishes it to the persistent compile cache set in cli/loading.py,
        # so the first real prompt pays no compile and a *second* process
        # start reaches the REPL warm in seconds.
        import time as _time

        t0 = _time.time()
        print("warming up (compiling the generation program)...", file=sys.stderr)
        generator.generate("warmup", gen_cfg, seed=args.seed)
        print(f"warmup done in {_time.time() - t0:.1f}s", file=sys.stderr)
    print("Enter a prompt (Ctrl-D to exit):", file=sys.stderr)
    for line in sys.stdin:
        prompt = line.rstrip("\n")
        if not prompt:
            continue
        if gen_args.chat:
            prompt = _apply_chat_template(tokenizer, prompt)
        try:
            if use_spec_stream:
                result = _stream_speculative(generator, prompt, gen_cfg, args.seed)
            else:
                streamer = (
                    TextStreamer(tokenizer) if gen_args.streamer == "standard" else None
                )
                result = generator.generate(prompt, gen_cfg, streamer=streamer,
                                            seed=args.seed)
                if streamer is None:
                    print(result.decoded_prediction)
        except Exception as e:  # reference prints + re-raises (generate.py:116-125)
            print(f"generation failed: {e}", file=sys.stderr)
            raise
        acc = result.generation_strategy_result.acceptance_rate
        print(
            f"\n[time: {result.total_time:.2f}s  tokens: "
            f"{result.num_tokens_generated}  tok/s: {result.tokens_per_second:.2f}"
            + (f"  acceptance: {acc:.3f}]" if acc is not None else "]"),
            file=sys.stderr,
        )


def _stream_speculative(generator, prompt, gen_cfg, seed):
    """Draft-paint / repaint streaming via per-round callbacks."""
    import time

    from layerskip_tpu.generation.generator import (
        GenerationResult,
        GenerationStrategyResult,
    )

    streamer = SpeculativeTextStreamer(generator.tokenizer)
    engine = generator.engine
    prompt_ids = generator._encode(prompt)
    eos = generator.eos_ids

    def on_round(drafted, accepted):
        if drafted:
            streamer.put(drafted, is_draft=True)
            streamer.delete(len(drafted))
        streamer.put(accepted)

    start = time.time()
    out = engine.stream_generate(
        prompt_ids, gen_cfg, jax.random.PRNGKey(seed), eos, on_round=on_round
    )
    jax.block_until_ready(out.tokens)
    total = time.time() - start
    streamer.end()
    tokens = postprocess_output(out, eos, gen_cfg.max_steps)
    n = len(tokens)
    drafts = max(int(out.drafts), 1)
    return GenerationResult(
        generation_strategy_result=GenerationStrategyResult(
            predicted_tokens=tokens,
            acceptance_rate=float(int(out.matches)) / drafts,
        ),
        decoded_prediction=generator.tokenizer.decode(tokens),
        num_tokens_generated=n,
        total_time=total,
        time_per_token=total / max(n, 1),
        tokens_per_second=n / total if total > 0 else 0.0,
    )


def process_cli_arguments():
    """reference: generate.py:144-157."""
    return parse_dataclasses((Arguments, GenerateArguments, GenerationConfig))


if __name__ == "__main__":
    a, g, c = process_cli_arguments()
    main(a, g, c)
