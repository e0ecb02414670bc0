"""Greedy-equivalence check: self-speculative output vs autoregressive.

Counterpart of the reference's ``correctness.py`` (correctness.py:38-99):
run the same prompts through both strategies with sampling off, count string
mismatches, write {total_errors, error_pct} JSON. This is the reference's
runtime correctness oracle (README.md:145-156); our test suite additionally
pins it as a unit test on tiny models (tests/test_generation.py).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import time
from layerskip_tpu.cli.args import Arguments, parse_dataclasses
from layerskip_tpu.cli.benchmark import BenchmarkArguments
from layerskip_tpu.cli.loading import load_model_and_tokenizer
from layerskip_tpu.config import GenerationConfig
from layerskip_tpu.data import get_data
from layerskip_tpu.generation.generator import LlamaGenerator

log = logging.getLogger(__name__)


def main(args: Arguments, bench_args: BenchmarkArguments, gen_cfg: GenerationConfig):
    params, cfg, tokenizer = load_model_and_tokenizer(args.model, seed=args.seed, dp=args.dp, tp=args.tp, quantize=args.quantize)
    generator = LlamaGenerator(tokenizer, params, cfg)

    spec_cfg = dataclasses.replace(
        gen_cfg, generation_strategy="self_speculative", sample=False
    )
    # AR forced to full model (reference correctness.py:46-48)
    ar_cfg = dataclasses.replace(
        gen_cfg, generation_strategy="autoregressive", sample=False,
        exit_layer=-1, num_speculations=-1,
    )

    evaluation_set = get_data(
        random_shuffle=bench_args.random_shuffle,
        num_samples=bench_args.num_samples,
        dataset=bench_args.dataset,
        data_path=bench_args.data_path,
        n_shot=bench_args.n_shot,
        seed=args.seed,
        template=bench_args.template,
    )
    errors = 0
    for i, example in enumerate(evaluation_set):
        spec = generator.generate(example.input, spec_cfg, seed=args.seed)
        ar = generator.generate(example.input, ar_cfg, seed=args.seed)
        if spec.decoded_prediction != ar.decoded_prediction:
            errors += 1
            log.error(
                "mismatch on sample %d:\n  spec: %r\n  ar:   %r",
                i, spec.decoded_prediction, ar.decoded_prediction,
            )
    n = len(evaluation_set)
    result = {"total_errors": errors, "error_pct": 100.0 * errors / max(n, 1)}
    os.makedirs(args.output_dir, exist_ok=True)
    out_path = os.path.join(args.output_dir, f"correctness_{int(time.time())}.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    a, b, c = parse_dataclasses((Arguments, BenchmarkArguments, GenerationConfig))
    main(a, b, c)
