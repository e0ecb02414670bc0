"""Grid sweep over exit_layer x num_speculations.

Counterpart of the reference's ``sweep.py`` (sweep.py:36-95): per-cell
benchmark, incremental CSV (so an interrupted sweep keeps partial results —
sweep.py:62-64), tabulate summary, contour PDF of tokens/s. The model is
loaded once and reused; each cell is a fresh jit (cached per
exit_layer/num_speculations combination).
"""

from __future__ import annotations

import csv
import dataclasses
import os
import time

from layerskip_tpu.cli.args import Arguments, parse_dataclasses
from layerskip_tpu.cli.benchmark import BenchmarkArguments, benchmark
from layerskip_tpu.cli.loading import load_model_and_tokenizer
from layerskip_tpu.config import GenerationConfig
from layerskip_tpu.generation.generator import LlamaGenerator


@dataclasses.dataclass
class SweepArguments:
    """reference: sweep.py:27-34 (same flag names/defaults)."""

    exit_layer_first: int = 1
    exit_layer_last: int = 15
    exit_layer_step: int = 1
    num_speculations_first: int = 1
    num_speculations_last: int = 6
    num_speculations_step: int = 1


FIELDS = [
    "exit_layer", "num_speculations", "acceptance_rate", "total_time",
    "time_per_token", "tokens_per_second",
]


def sweep(
    args: Arguments,
    bench_args: BenchmarkArguments,
    sweep_args: SweepArguments,
    gen_cfg: GenerationConfig,
):
    params, cfg, tokenizer = load_model_and_tokenizer(args.model, seed=args.seed, dp=args.dp, tp=args.tp, quantize=args.quantize)
    generator = LlamaGenerator(tokenizer, params, cfg)

    os.makedirs(args.output_dir, exist_ok=True)
    csv_path = os.path.join(args.output_dir, f"sweep_{int(time.time())}.csv")
    rows = []
    gen_cfg = dataclasses.replace(gen_cfg, generation_strategy="self_speculative")
    max_exit = min(sweep_args.exit_layer_last, cfg.num_hidden_layers - 1)
    for exit_layer in range(
        sweep_args.exit_layer_first, max_exit + 1, sweep_args.exit_layer_step
    ):
        for num_spec in range(
            sweep_args.num_speculations_first,
            sweep_args.num_speculations_last + 1,
            sweep_args.num_speculations_step,
        ):
            cell_cfg = dataclasses.replace(
                gen_cfg, exit_layer=exit_layer, num_speculations=num_spec
            )
            metric_result, _ = benchmark(generator, bench_args, cell_cfg, args.seed)
            row = {
                "exit_layer": exit_layer,
                "num_speculations": num_spec,
                "acceptance_rate": metric_result["acceptance_rate"]["mean"],
                "total_time": metric_result["total_time"]["mean"],
                "time_per_token": metric_result["time_per_token"]["mean"],
                "tokens_per_second": metric_result["tokens_per_second"]["mean"],
            }
            rows.append(row)
            # incremental rewrite (reference sweep.py:62-64)
            with open(csv_path, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=FIELDS)
                w.writeheader()
                w.writerows(rows)
            print(f"exit={exit_layer} spec={num_spec}: "
                  f"{row['tokens_per_second']:.2f} tok/s")

    try:
        from tabulate import tabulate

        print(tabulate(rows, headers="keys", floatfmt=".3f"))
    except ImportError:
        pass
    pdf_path = csv_path.replace(".csv", ".pdf")
    try:
        plot_contour(rows, pdf_path)
        print(f"wrote {pdf_path}")
    except Exception as e:
        print(f"contour plot skipped: {e}")
    print(f"wrote {csv_path}")
    return rows


def plot_contour(rows, pdf_path: str):
    """tokens/s contour over the grid (reference sweep.py:76-95)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np
    from scipy.interpolate import griddata

    x = np.array([r["exit_layer"] for r in rows], float)
    y = np.array([r["num_speculations"] for r in rows], float)
    z = np.array([r["tokens_per_second"] for r in rows], float)
    xi = np.linspace(x.min(), x.max(), 100)
    yi = np.linspace(y.min(), y.max(), 100)
    zi = griddata((x, y), z, (xi[None, :], yi[:, None]), method="cubic")
    fig, ax = plt.subplots()
    c = ax.contourf(xi, yi, zi, levels=14)
    fig.colorbar(c, label="tokens/s")
    ax.set_xlabel("exit_layer")
    ax.set_ylabel("num_speculations")
    fig.savefig(pdf_path)
    plt.close(fig)


if __name__ == "__main__":
    a, b, s, c = parse_dataclasses(
        (Arguments, BenchmarkArguments, SweepArguments, GenerationConfig)
    )
    sweep(a, b, s, c)
