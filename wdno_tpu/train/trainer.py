"""Training loop: single jitted SPMD step, orbax checkpoints, metrics log.

TPU-native replacement of the two reference Trainer classes
(``burgers/ddpm_burgers/train_diffusion.py:39-237`` and
``smoke/ddpm/diffusion_2d.py:1061-1309``): one compiled train step holds the
q-sample, conditioning, denoiser fwd/bwd, grad-clip, Adam, LR schedule, EMA
and (on a multi-chip mesh) the gradient all-reduce — no host round-trips,
no explicit barriers.  Gradient accumulation is a ``lax.scan`` over
micro-batches inside the same step.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
import orbax.checkpoint as ocp

from ..core.diffusion import GaussianDiffusion
from ..parallel.mesh import make_mesh, shard_batch, train_state_shardings
from .state import TrainConfig, TrainState, create_train_state, ema_update, make_optimizer

__all__ = ["Trainer", "make_train_step"]


def make_train_step(
    diffusion: GaussianDiffusion, cfg: TrainConfig
) -> Callable[[TrainState, jnp.ndarray, jax.Array], tuple]:
    """Build the jittable (state, batch, rng) -> (state, metrics) step."""
    tx = make_optimizer(cfg)
    accum = cfg.gradient_accumulate_every

    def loss_fn(params, rng, batch):
        return diffusion.loss(params, rng, batch)

    def step_fn(state: TrainState, batch: jnp.ndarray, rng: jax.Array):
        if accum == 1:
            loss, grads = jax.value_and_grad(loss_fn)(state.params, rng, batch)
        else:
            micro = jnp.reshape(batch, (accum, batch.shape[0] // accum) + batch.shape[1:])
            rngs = jax.random.split(rng, accum)

            def micro_step(carry, inp):
                mb, r = inp
                l, g = jax.value_and_grad(loss_fn)(state.params, r, mb)
                acc_l, acc_g = carry
                return (acc_l + l, jax.tree_util.tree_map(jnp.add, acc_g, g)), ()

            zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (loss, grads), _ = jax.lax.scan(micro_step, (0.0, zero), (micro, rngs))
            loss = loss / accum
            grads = jax.tree_util.tree_map(lambda g: g / accum, grads)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            ema_params=state.ema_params,
        )
        new_state = new_state.replace(ema_params=ema_update(new_state, cfg))
        gnorm = optax.global_norm(grads)
        return new_state, {"loss": loss, "grad_norm": gnorm}

    return step_fn


class Trainer:
    """Drives the jitted step over a data iterator with checkpointing.

    Checkpoints hold ``{step, params, opt_state, ema_params}`` — the same
    logical contents as the reference's ``{step, model, opt, ema, scaler}``
    pickles (``train_diffusion.py:148-162``) — via orbax, saved every
    ``save_every`` steps as milestone directories.
    """

    def __init__(
        self,
        diffusion,  # GaussianDiffusion, or a list of them (one per resolution level)
        data_iter: Iterator,  # yields batch, or (level, batch) for multi-level
        cfg: TrainConfig,
        init_params: Any,
        results_dir: str,
        *,
        mesh=None,
        fsdp: bool = False,
        context_parallel: bool = False,
        save_every: int = 10_000,
        log_every: int = 100,
        seed: int = 0,
        trace_dir: Optional[str] = None,
        trace_start: int = 10,
        trace_steps: int = 5,
        loaders=None,  # optional: underlying loaders, for health flags in the log
    ):
        diffusions = diffusion if isinstance(diffusion, (list, tuple)) else [diffusion]
        self.diffusion = diffusions[0]
        self.data_iter = data_iter
        self.loaders = list(loaders) if loaders else []
        self.cfg = cfg
        self.results_dir = results_dir
        os.makedirs(results_dir, exist_ok=True)
        self.save_every = save_every
        self.log_every = log_every
        self.mesh = mesh if mesh is not None else make_mesh(model=1)
        self.state = create_train_state(init_params, cfg)

        # Replicated under pure DP; kernel out-channels sharded over the
        # 'model' axis when the mesh has one (tensor parallelism), and
        # in-channels over 'data' under fsdp (ZeRO-3 fully-sharded state).
        # context_parallel instead spends the 'model' axis on the batch's
        # sequence (frame/time) dimension — GSPMD inserts the halo
        # exchanges for temporal convs and the attention all-gathers —
        # so kernels stay replicated over 'model' in that mode.
        if context_parallel:
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch_sh = NamedSharding(self.mesh, P("data", "model"))
            state_shardings = train_state_shardings(
                self.mesh, self.state, axis="__unused__", fsdp=fsdp
            )
        else:
            batch_sh = shard_batch(self.mesh)
            state_shardings = train_state_shardings(self.mesh, self.state, fsdp=fsdp)
        self._batch_sharding = batch_sh
        # One compiled step per resolution level (static XLA shape buckets,
        # replacing the reference SuperDataLoader's per-resolution batches).
        self._steps = [
            jax.jit(
                make_train_step(gd, cfg),
                in_shardings=(state_shardings, batch_sh, None),
                out_shardings=(state_shardings, None),
                donate_argnums=(0,),
            )
            for gd in diffusions
        ]
        self._step = self._steps[0]
        self._ckpt = ocp.StandardCheckpointer()
        self._rng = jax.random.PRNGKey(seed)
        self._log_path = os.path.join(results_dir, "metrics.jsonl")
        # on-demand jax.profiler capture (SURVEY §5: replaces the TF
        # Timeliner; view in Perfetto/TensorBoard).  Starts after
        # ``trace_start`` steps so compile/warmup stays out of the trace.
        self.trace_dir = trace_dir
        self.trace_start = trace_start
        self.trace_steps = trace_steps
        self._tracing = False

    # ------------------------------------------------------------------ io

    def save(self, milestone: int, *, block: bool = True) -> str:
        """Checkpoint the full TrainState as ``model-{milestone}``.

        ``block=False`` lets orbax write asynchronously so periodic
        milestone saves overlap training (the host-side device_get is
        still synchronous); the previous async save is drained first —
        orbax writes into a temp dir and renames, so an interrupted async
        save never leaves a restorable-looking partial checkpoint."""
        self._ckpt.wait_until_finished()
        path = os.path.join(os.path.abspath(self.results_dir), f"model-{milestone}")
        self._ckpt.save(path, jax.device_get(self.state), force=True)
        if block:
            self._ckpt.wait_until_finished()
        return path

    def load(self, milestone_or_path) -> None:
        path = (
            milestone_or_path
            if isinstance(milestone_or_path, str)
            else os.path.join(os.path.abspath(self.results_dir), f"model-{milestone_or_path}")
        )
        target = jax.device_get(self.state)
        self.state = self._ckpt.restore(path, target)

    def restore_latest(self) -> Optional[int]:
        """Resume from the newest milestone checkpoint in results_dir, if
        any.  This is the elastic-recovery piece the reference lacks
        entirely (SURVEY §5: restarts only via manual ``Trainer.load``);
        here a crashed/preempted run resumes with one call.
        Returns the restored step or None."""
        import re

        best = None
        for name in os.listdir(self.results_dir):
            m = re.fullmatch(r"model-(\d+)", name)
            if m:
                n = int(m.group(1))
                if best is None or n > best:
                    best = n
        if best is None:
            return None
        self.load(best)
        return int(self.state.step)

    def _log(self, step: int, metrics: dict) -> None:
        rec = {"step": step, "time": time.time(), **{k: float(v) for k, v in metrics.items()}}
        with open(self._log_path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    # --------------------------------------------------------------- train

    def _prefetched(self, size: int = 2):
        """Double-buffered host->device pipeline: ``jax.device_put`` the next
        batch(es) while the current step runs, so the transfer overlaps
        compute instead of serializing with it (this dominates step time when
        the chip is reached over a slow host link)."""
        from collections import deque

        def place(x):
            if isinstance(x, jax.Array):  # already on device (DeviceResidentLoader)
                return x
            return jax.device_put(jnp.asarray(x), self._batch_sharding)

        def put(item):
            if isinstance(item, tuple) and len(item) == 2 and np.isscalar(item[0]):
                return int(item[0]), place(item[1])
            return 0, place(item)

        buf = deque(put(next(self.data_iter)) for _ in range(size))
        while True:
            yield buf.popleft()
            buf.append(put(next(self.data_iter)))

    def train(self, num_steps: Optional[int] = None) -> dict:
        """Train until ``state.step`` reaches ``num_steps`` (a TOTAL budget,
        like the reference's ``while self.step < train_num_steps``) — a
        resumed run finishes the configured run rather than appending
        ``num_steps`` more on top of the restored step."""
        num_steps = num_steps or self.cfg.train_num_steps
        done = int(self.state.step)
        remaining = max(0, num_steps - done)
        if remaining == 0 and done:
            print(f"already trained to step {done} >= {num_steps}; nothing to do")
            return {}
        last = {}
        t0 = time.time()
        steps_at_log = 0
        batches = self._prefetched()
        key_buf: list = []
        for i in range(remaining):
            lvl, batch = next(batches)
            if not key_buf:
                # split keys in chunks: a per-step eager split is a tiny
                # device dispatch that costs real latency on remote backends
                key_buf = list(jax.random.split(self._rng, 257))
                self._rng = key_buf.pop()
            rng = key_buf.pop()
            if self.trace_dir and i == self.trace_start:
                jax.block_until_ready(self.state.params)
                jax.profiler.start_trace(self.trace_dir)
                self._tracing = True
            self.state, metrics = self._steps[lvl](self.state, batch, rng)
            if self._tracing and i >= self.trace_start + self.trace_steps - 1:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                self._tracing = False
            # host-side step counter: int(self.state.step) would be a
            # blocking device->host readback EVERY step, serializing the
            # dispatch pipeline (expensive over the tunneled chip link)
            step = done + i + 1
            if step % self.log_every == 0 or i == remaining - 1:
                last = {k: float(v) for k, v in metrics.items()}
                # windowed rate (since the previous log line): a cumulative
                # average buries steady-state throughput under compile and
                # data-upload time for the whole run
                now = time.time()
                last["steps_per_sec"] = (i + 1 - steps_at_log) / (now - t0)
                # surface a frozen streaming reservoir in the metrics (a
                # background-thread print is invisible post-hoc, ADVICE r3):
                # every later record carries the flag, so the freeze step is
                # the first record that has it
                if any(getattr(ld, "frozen", False) for ld in self.loaders):
                    last["reservoir_frozen"] = 1.0
                steps_at_log, t0 = i + 1, now
                self._log(step, last)
            if self.save_every and step % self.save_every == 0:
                # milestone name == step (not step//save_every): import-ckpt
                # writes model-{step}, and "latest"/restore_latest pick the
                # max numeric name — mixing the two schemes made a resumed
                # imported experiment prefer its stale import forever
                self.save(step, block=False)
        if self._tracing:  # num_steps ended inside the trace window
            jax.profiler.stop_trace()
            self._tracing = False
        # drain any in-flight async milestone save before returning
        self._ckpt.wait_until_finished()
        return last
