"""LayerSkip training/finetuning driver.

The reference repo defers training entirely to torchtune/trl PRs
(README.md:166-167); this CLI makes the recipe in
``layerskip_tpu/training/recipe.py`` (layer dropout + rotational early-exit
loss — the procedure that produces LayerSkip checkpoints) runnable
end-to-end:

  * token batches from the same data layer the benchmarks use,
  * optional (dp, fsdp, tp) mesh with sequence-parallel activations,
  * orbax checkpointing with resume (the reference has no
    checkpoint/resume story at all — SURVEY §5.3/5.4),
  * HF-compatible safetensors export at the end (models/params.save_params),
    so trained models feed straight into the inference engines.

Usage:
  python -m layerskip_tpu.cli.train --model random:tiny --dataset custom_jsonl \
      --data_path data.jsonl --steps 100 --checkpoint_dir ckpts/
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from layerskip_tpu.cli.args import Arguments, parse_dataclasses
from layerskip_tpu.cli.loading import load_model_and_tokenizer
from layerskip_tpu.data import get_data
from layerskip_tpu.training.recipe import TrainConfig, make_train_step

log = logging.getLogger(__name__)


@dataclasses.dataclass
class TrainArguments:
    dataset: str = "custom_jsonl"
    data_path: Optional[str] = None
    steps: int = 100
    batch_size: int = 4
    seq_len: int = 256
    # LayerSkip recipe
    p_max: float = 0.1
    dropout_scale: str = "exp"
    early_exit_layers: Optional[str] = None  # comma ints; default: sparse
    # quarter-depth exits (training.recipe.default_exit_layers)
    ce_chunk_tokens: int = 1024  # token-chunked CE; 0 => dense [B,T,V]
    e_scale: float = 1.0
    rotational_r: int = 0
    learning_rate: float = 1e-4
    weight_decay: float = 0.01
    # infra
    checkpoint_dir: Optional[str] = None
    save_every: int = 50
    resume: bool = True
    export_dir: Optional[str] = None  # HF safetensors export at the end
    fsdp: int = 1  # dp/tp come from the shared Arguments flags
    log_every: int = 10


def build_batches(examples, tokenizer, batch_size, seq_len, steps, pad_id=0):
    """Pack (input+output) token streams into [B, T] id/label batches."""
    token_stream: List[int] = []
    for ex in examples:
        text = ex.input + ex.output
        ids = tokenizer.encode(text) if hasattr(tokenizer, "encode") else (
            tokenizer(text)["input_ids"]
        )
        token_stream.extend(int(t) for t in ids)
    if not token_stream:
        raise ValueError("no training tokens")
    need = steps * batch_size * (seq_len + 1)
    reps = need // len(token_stream) + 1
    token_stream = (token_stream * reps)[:need]
    arr = np.asarray(token_stream, np.int32).reshape(
        steps, batch_size, seq_len + 1
    )
    for i in range(steps):
        yield arr[i, :, :-1], arr[i, :, 1:]


def main(args: Arguments, targs: TrainArguments):
    import optax

    params, cfg, tokenizer = load_model_and_tokenizer(args.model, seed=args.seed)

    exits = ()
    if targs.early_exit_layers:
        exits = tuple(int(x) for x in str(targs.early_exit_layers).split(","))
    tcfg = TrainConfig(
        p_max=targs.p_max, dropout_scale=targs.dropout_scale,
        early_exit_layers=exits, e_scale=targs.e_scale,
        rotational_r=targs.rotational_r, learning_rate=targs.learning_rate,
        weight_decay=targs.weight_decay,
        ce_chunk_tokens=targs.ce_chunk_tokens,
        act_spec=(
            ("dp", "fsdp", None)
            if args.dp * targs.fsdp * args.tp > 1 else None
        ),
    )
    train_step, init_opt = make_train_step(cfg, tcfg)
    opt_state = init_opt(params)
    start_step = 0

    mngr = None
    if targs.checkpoint_dir:
        import orbax.checkpoint as ocp

        mngr = ocp.CheckpointManager(
            os.path.abspath(targs.checkpoint_dir),
            options=ocp.CheckpointManagerOptions(max_to_keep=3),
        )
        if targs.resume and mngr.latest_step() is not None:
            start_step = int(mngr.latest_step())
            restored = mngr.restore(
                start_step,
                args=ocp.args.Composite(
                    params=ocp.args.StandardRestore(params),
                    opt_state=ocp.args.StandardRestore(opt_state),
                ),
            )
            params, opt_state = restored["params"], restored["opt_state"]
            log.info("resumed from step %d", start_step)
            print(f"resumed from checkpoint step {start_step}")

    mesh = None
    if args.dp * targs.fsdp * args.tp > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from layerskip_tpu.parallel.mesh import make_train_mesh
        from layerskip_tpu.parallel.sharding import param_specs_from, to_named

        mesh = make_train_mesh(dp=args.dp, fsdp=targs.fsdp, tp=args.tp)
        shardings = to_named(mesh, param_specs_from(params, fsdp=True))
        params = jax.tree.map(jax.device_put, params, shardings)
        batch_sharding = NamedSharding(mesh, P("dp", "fsdp"))
    else:
        batch_sharding = None

    examples = get_data(
        random_shuffle=True, num_samples=0, dataset=targs.dataset,
        data_path=targs.data_path, seed=args.seed,
    )
    import contextlib

    step_fn = jax.jit(train_step, donate_argnums=(0, 1))
    rng = jax.random.PRNGKey(args.seed)
    # with_sharding_constraint(PartitionSpec) needs an active mesh context
    mesh_ctx = mesh if mesh is not None else contextlib.nullcontext()

    t0 = time.time()
    batches = build_batches(
        examples, tokenizer, targs.batch_size, targs.seq_len,
        targs.steps - start_step,
    )
    history = []
    for step, (ids, labels) in enumerate(batches, start=start_step):
        ids_d, labels_d = jnp.asarray(ids), jnp.asarray(labels)
        if batch_sharding is not None:
            ids_d = jax.device_put(ids_d, batch_sharding)
            labels_d = jax.device_put(labels_d, batch_sharding)
        rng, key = jax.random.split(rng)
        with mesh_ctx:
            params, opt_state, aux = step_fn(
                params, opt_state, ids_d, labels_d, key, jnp.int32(step)
            )
        if (step + 1) % targs.log_every == 0 or step == start_step:
            loss = float(np.asarray(aux["loss"]))  # sync
            dt = time.time() - t0
            tokens = targs.batch_size * targs.seq_len * (step + 1 - start_step)
            history.append((step + 1, loss))
            print(f"step {step + 1}/{targs.steps} loss={loss:.4f} "
                  f"({tokens / max(dt, 1e-9):.0f} tok/s)")
        if mngr is not None and (step + 1) % targs.save_every == 0:
            import orbax.checkpoint as ocp

            mngr.save(
                step + 1,
                args=ocp.args.Composite(
                    params=ocp.args.StandardSave(params),
                    opt_state=ocp.args.StandardSave(opt_state),
                ),
            )
    if mngr is not None:
        mngr.wait_until_finished()
    if targs.export_dir:
        from layerskip_tpu.models.params import save_params

        path = save_params(params, targs.export_dir, cfg)
        print(f"exported HF-compatible checkpoint to {path}")
    return params, history


if __name__ == "__main__":
    a, t = parse_dataclasses((Arguments, TrainArguments))
    main(a, t)
