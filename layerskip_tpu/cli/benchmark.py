"""Dataset benchmark: generate over a task set, aggregate quality + speed.

Counterpart of the reference's ``benchmark.py`` (benchmark.py:155-248): same
flags, same metric schema, same flow (strategy dispatch -> get_data -> per-
sample generate + metrics.update -> compute -> JSON dump). One deliberate
fix: the reference writes four *concatenated* JSON objects to one file
(benchmark.py:224-228 — not parseable as a whole; SURVEY §5.5); we write a
single valid JSON object with the same four sections.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import time
from typing import Optional

from layerskip_tpu.cli.args import Arguments, parse_dataclasses
from layerskip_tpu.cli.loading import load_model_and_tokenizer
from layerskip_tpu.config import GenerationConfig
from layerskip_tpu.data import get_data
from layerskip_tpu.generation.generator import LlamaGenerator
from layerskip_tpu.metrics import EvaluationMetrics

log = logging.getLogger(__name__)


@dataclasses.dataclass
class BenchmarkArguments:
    """reference: benchmark.py:43-50 (+ TPU profiling extension)."""

    dataset: str = "cnn_dm_summarization"
    data_path: Optional[str] = None
    random_shuffle: bool = True
    num_samples: Optional[int] = None
    n_shot: int = 0
    template: Optional[str] = None
    profile_dir: Optional[str] = None  # capture a jax.profiler trace here


def benchmark(
    generator: LlamaGenerator,
    benchmark_arguments: BenchmarkArguments,
    generation_config: GenerationConfig,
    seed: int = 42,
):
    """reference: benchmark.py:155-204. Returns (metrics dict, metrics obj)."""
    evaluation_set = get_data(
        random_shuffle=benchmark_arguments.random_shuffle,
        num_samples=benchmark_arguments.num_samples,
        dataset=benchmark_arguments.dataset,
        data_path=benchmark_arguments.data_path,
        n_shot=benchmark_arguments.n_shot,
        seed=seed,
        template=benchmark_arguments.template,
    )
    metrics = EvaluationMetrics.build_metrics()
    profiling = None
    if benchmark_arguments.profile_dir:
        from layerskip_tpu.utils.profiling import trace

        profiling = trace(benchmark_arguments.profile_dir)
        profiling.__enter__()
    for i, example in enumerate(evaluation_set):
        result = generator.generate(
            prompt=example.input, generation_config=generation_config, seed=seed
        )
        print(
            f"[{i + 1}/{len(evaluation_set)}] tokens={result.num_tokens_generated} "
            f"tok/s={result.tokens_per_second:.2f}"
        )
        if not result.decoded_prediction:
            # reference skips empty generations (benchmark.py:196-199)
            log.warning("skipping empty generation for metrics")
            continue
        metrics.update(example, result)
    if profiling is not None:
        profiling.__exit__(None, None, None)
        print(f"profiler trace written to {benchmark_arguments.profile_dir}")
    return metrics.compute(), metrics


def main(args: Arguments, bench_args: BenchmarkArguments, gen_cfg: GenerationConfig):
    params, cfg, tokenizer = load_model_and_tokenizer(args.model, seed=args.seed, dp=args.dp, tp=args.tp, quantize=args.quantize)
    generator = LlamaGenerator(tokenizer, params, cfg)
    metric_result, _ = benchmark(generator, bench_args, gen_cfg, args.seed)

    os.makedirs(args.output_dir, exist_ok=True)
    out_path = os.path.join(args.output_dir, f"benchmark_{int(time.time())}.json")
    with open(out_path, "w") as f:
        json.dump(
            {
                "args": dataclasses.asdict(args),
                "benchmark_arguments": dataclasses.asdict(bench_args),
                "generation_config": dataclasses.asdict(gen_cfg),
                "metric_result": metric_result,
            },
            f, indent=2,
        )
    print(json.dumps(metric_result, indent=2))
    print(f"wrote {out_path}")
    return metric_result


if __name__ == "__main__":
    a, b, c = parse_dataclasses((Arguments, BenchmarkArguments, GenerationConfig))
    main(a, b, c)
