"""Unified command-line entry: datagen / prep / train / eval / bench.

Replaces the reference's six per-script argparse forests + shell wrappers
(SURVEY §1 L5/L6) with one config-driven CLI:

    python -m wdno_tpu.cli datagen-burgers --n 48000 --out data/1d
    python -m wdno_tpu.cli prep-burgers   --data data/1d
    python -m wdno_tpu.cli train-burgers  --data data/1d --exp base_sim
    python -m wdno_tpu.cli eval-burgers   --data data/1d --exp base_sim --task sim
    python -m wdno_tpu.cli datagen-smoke  --n 20000 --out data/2d
    python -m wdno_tpu.cli train-smoke    --data data/2d --exp base_sim
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

import numpy as np


def _add_common(ap):
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--results", type=str, default="results")
    return ap


def cmd_datagen_burgers(args):
    from .data.burgers_data import generate_burgers_dataset

    os.makedirs(args.out, exist_ok=True)
    for split, n in (("train", args.n_train), ("test", args.n_test)):
        if n <= 0:
            continue
        data = generate_burgers_dataset(
            args.seed if split == "train" else args.seed + 1,
            n,
            nt=args.nt,
            nx=args.nx,
            super_factor=args.super_factor,
            batch_size=args.batch,
        )
        np.savez(os.path.join(args.out, f"{split}.npz"), **data)
        print(f"saved {split}: u {data['u'].shape} f {data['f'].shape}")


def cmd_prep_burgers(args):
    from .data.burgers_data import build_coef_levels

    data = np.load(os.path.join(args.data, "train.npz"))
    db = build_coef_levels(
        data["u"], data["f"], wave_type=args.wave_type, pad_mode=args.pad_mode,
        n_downsample=args.n_downsample,
    )
    out = os.path.join(args.data, f"coef_{args.wave_type}_{args.pad_mode}.npz")
    np.savez(
        out,
        **{f"coef_{i}": c for i, c in enumerate(db["coef"])},
        shape=np.asarray(db["shape"]),
        ori_shape=np.asarray(db["ori_shape"]),
        n_levels=args.n_downsample,
    )
    print("saved", out, [c.shape for c in db["coef"]])



def _eval_mesh(batch_eval: int, mode: str = "auto"):
    """Data-parallel mesh for evaluation sampling.

    ``auto`` shards when several devices are visible and the eval batch
    divides over them; ``off`` never shards (bit-reproducible single-device
    numbers — SPMD reassociation drifts slightly per sampler step);
    ``on`` requires a divisible batch and fails loudly otherwise."""
    import jax

    n = jax.device_count()
    if mode == "off" or n <= 1:
        return None
    if batch_eval % n:
        if mode == "on":
            raise SystemExit(
                f"--shard_eval on: batch_eval {batch_eval} does not divide "
                f"the {n} visible devices"
            )
        return None
    from .parallel.mesh import make_mesh

    return make_mesh(model=1)


def _load_coef_db(path, probe=False):
    """Load a coefficient database written by ``prep-burgers``.

    With ``probe=True``, only the npy headers of the (uncompressed) zip
    members are read and the per-level arrays come back as single-sample
    zeros of the right shape/dtype.  Eval entry points use the db purely as
    a shape probe (sampling conditions are built from the test set), and
    materializing the full blob costs minutes and several GB of host RAM
    per eval chunk.
    """
    z = np.load(path)
    n = int(z["n_levels"])
    if probe:
        import zipfile

        from numpy.lib import format as npf

        coef = []
        with zipfile.ZipFile(path) as zf:
            for i in range(n):
                with zf.open(f"coef_{i}.npy") as f:
                    version = npf.read_magic(f)
                    read_header = (
                        npf.read_array_header_1_0
                        if version == (1, 0)
                        else npf.read_array_header_2_0
                    )
                    shape, _, dtype = read_header(f)
                coef.append(np.zeros((1,) + shape[1:], dtype))
    else:
        coef = [z[f"coef_{i}"] for i in range(n)]
    return {
        "coef": coef,
        "shape": z["shape"].tolist(),
        "ori_shape": z["ori_shape"].tolist(),
    }


def _make_burgers_training(args, state_shapes, coef_shapes, rescaler):
    """Build (model, per-level diffusions, init train state, cfg) from the
    per-level state shapes — no data arrays needed."""
    import jax
    import jax.numpy as jnp

    from .core.conditioning import burgers_raw_spec, burgers_wavelet_spec
    from .core.diffusion import GaussianDiffusion
    from .core.schedules import make_schedule
    from .models.unet2d import UNet2D
    from .train.state import TrainConfig, create_train_state

    is_wavelet = getattr(args, "wavelet", True)
    C = state_shapes[0][-1]
    model = UNet2D(
        dim=args.dim, dim_mults=tuple(args.dim_mults), channels=C,
        resnet_block_groups=getattr(args, "resnet_block_groups", 1),
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    sched = make_schedule(args.beta_schedule, args.timesteps)

    cfg = TrainConfig(
        learning_rate=args.lr, lr_schedule="cosine", cosine_t_max=10000,
        train_num_steps=args.steps,
        gradient_accumulate_every=args.grad_accum,
    )
    gds = []
    for spec_shape, coef_shape in zip(state_shapes, coef_shapes):
        if is_wavelet:
            nt_bump = coef_shape[0] + (1 if args.super_model else 0)
            spec = burgers_wavelet_spec(
                tuple(spec_shape), (nt_bump, coef_shape[1]),
                is_condition_u0=args.condition_u0, is_condition_uT=args.condition_uT,
                is_condition_f=args.condition_f, is_super_model=args.super_model,
                is_condition_pad=getattr(args, "condition_pad", True),
            )
        else:
            spec = burgers_raw_spec(
                tuple(spec_shape), tuple(coef_shape),
                is_condition_u0=args.condition_u0, is_condition_uT=args.condition_uT,
                is_condition_f=args.condition_f, is_super_model=args.super_model,
                is_condition_pad=getattr(args, "condition_pad", True),
            )
        gds.append(GaussianDiffusion(
            model.apply, sched, state_shape=tuple(spec_shape), spec=spec,
            loss_channel_weight=rescaler if is_wavelet else None,
        ))

    x0 = jnp.zeros((args.batch,) + gds[0].state_shape)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(args.seed), x0, jnp.zeros((args.batch,), jnp.int32)
    )
    state = create_train_state(params, cfg)
    return model, gds, state, cfg


def _train_with_loaders(args, gds, state, cfg, shard_paths, loaders=None):
    """Shared train driver: native shard loaders -> Trainer (jitted SPMD
    step, orbax milestones, metrics jsonl, elastic resume).  Pass ready-made
    ``loaders`` (e.g. a streaming reservoir) to skip shard-path selection."""
    from .data.loader import MultiResolutionLoader, NativeShardLoader
    from .train.trainer import Trainer

    outdir = os.path.join(args.results, args.exp)
    os.makedirs(outdir, exist_ok=True)
    # Duplicate-experiment-id guard (reference ``log_exp``,
    # ``train_ddpm_burgers.py:203-217`` raises on a reused exp id): refuse to
    # silently overwrite an existing experiment unless resuming or forced.
    cfg_path = os.path.join(outdir, "config.json")
    if (
        os.path.exists(cfg_path)
        and not getattr(args, "resume", False)
        and not getattr(args, "overwrite", False)
    ):
        raise SystemExit(
            f"experiment id '{args.exp}' already exists at {outdir}; "
            "pass --resume to continue it or --overwrite to replace it"
        )
    json.dump({k: v for k, v in vars(args).items() if k != "fn"},
              open(cfg_path, "w"), indent=1)

    # Device-resident input when the dataset fits in HBM on a single chip
    # (no per-step host->device transfer); host mmap+prefetch loaders
    # otherwise and on multi-device meshes.
    import jax

    from .data.loader import DeviceResidentLoader

    if loaders is not None:
        return _run_trainer(args, gds, state, cfg, loaders)

    total_bytes = sum(os.path.getsize(p) for p in shard_paths)
    # Budget from actual free HBM when the backend reports it (60% of free
    # leaves room for params/opt/EMA + activations); conservative 6 GB
    # fallback otherwise (some backends, e.g. tunneled chips, report no
    # memory stats).  WDNO_DEVICE_DATA_GB overrides both.
    budget = 6e9
    try:
        ms = jax.devices()[0].memory_stats() or {}
        free = ms.get("bytes_limit", 0) - ms.get("bytes_in_use", 0)
        if free > 0:
            budget = 0.6 * free
    except Exception:
        pass
    if os.environ.get("WDNO_DEVICE_DATA_GB"):
        budget = float(os.environ["WDNO_DEVICE_DATA_GB"]) * 1e9
    single = not getattr(args, "host_data", False) and jax.device_count() == 1
    if single and total_bytes < budget:
        print(f"input pipeline: device-resident ({total_bytes / 1e9:.2f} GB)")
        loaders = [
            DeviceResidentLoader(p, batch_size=args.batch, seed=args.seed + i)
            for i, p in enumerate(shard_paths)
        ]
    elif single:
        # Too big for HBM on one chip: reservoir tier — HBM slab ring with
        # byte-budgeted background refresh.  NEVER stream per-step batches
        # through the tunnel: the client leaks ~95% of transferred bytes
        # into host RSS (measured; a 3.5 MB/step loop leaks ~2.5 GB/min).
        from .data.loader import ReservoirLoader

        print(f"input pipeline: HBM reservoir ({total_bytes / 1e9:.2f} GB total)")
        refresh_total = float(os.environ.get("WDNO_REFRESH_GB", "40")) * 1e9
        loaders = []
        for i, p in enumerate(shard_paths):
            share = os.path.getsize(p) / total_bytes
            loaders.append(ReservoirLoader(
                np.load(p, mmap_mode="r"), args.batch, seed=args.seed + i,
                device_budget_bytes=budget * share,
                refresh_budget_bytes=refresh_total * share,
            ))
            kind = ("resident" if loaders[-1].n_slabs == 1
                    else f"{loaders[-1].n_slabs}x{loaders[-1].slab_items}-slab")
            print(f"  shard {i}: {kind}")
    else:
        print(f"input pipeline: host shards ({total_bytes / 1e9:.2f} GB)")
        loaders = [
            NativeShardLoader(p, batch_size=args.batch, seed=args.seed + i)
            for i, p in enumerate(shard_paths)
        ]
    return _run_trainer(args, gds, state, cfg, loaders)


def _run_trainer(args, gds, state, cfg, loaders):
    import jax

    from .data.loader import MultiResolutionLoader
    from .train.trainer import Trainer

    outdir = os.path.join(args.results, args.exp)
    data_iter = (
        iter(MultiResolutionLoader(loaders, seed=args.seed))
        if len(loaders) > 1
        else iter(loaders[0])
    )
    mesh = None
    tp = getattr(args, "model_parallel", 1)
    fsdp = bool(getattr(args, "fsdp", False))
    if tp < 1 or jax.device_count() % tp:
        raise SystemExit(
            f"--model_parallel {tp} must be >= 1 and divide the device "
            f"count ({jax.device_count()})"
        )
    cp = bool(getattr(args, "context_parallel", False))
    if cp and tp <= 1:
        raise SystemExit("--context_parallel requires --model_parallel > 1")
    if tp > 1:
        from .parallel.mesh import make_mesh

        mesh = make_mesh(model=tp)
        print(f"mesh: data={mesh.shape['data']} x model={tp}"
              + (" (fsdp)" if fsdp else "") + (" (cp)" if cp else ""))
    trainer = Trainer(
        gds, data_iter, cfg, state.params, outdir,
        save_every=args.ckpt_every, log_every=args.log_every, seed=args.seed,
        trace_dir=getattr(args, "trace_dir", None), mesh=mesh, fsdp=fsdp,
        context_parallel=cp, loaders=loaders,
    )
    if getattr(args, "resume", False):
        restored = trainer.restore_latest()
        if restored is not None:
            print(f"resumed from step {restored}")
    trainer.train(args.steps)
    trainer.save("final")
    for ld in loaders:
        ld.close()
    print("saved", outdir)


def cmd_train_burgers(args):
    from .data.burgers_data import build_raw_states, build_training_states
    from .data.loader import parse_npy_header
    from .data.rescalers import burgers_wavelet_rescaler

    levels = list(range(args.n_downsample)) if args.super_model else [0]
    shard_paths, state_shapes, coef_shapes = [], [], []
    if args.wavelet:
        db = _load_coef_db(os.path.join(args.data, f"coef_{args.wave_type}_{args.pad_mode}.npz"))
        rescaler = burgers_wavelet_rescaler(
            args.wave_type, args.pad_mode, is_super_model=args.super_model,
            has_condition_channel=args.condition_u0 or args.condition_uT,
        )
        tag = "_".join([
            args.wave_type, args.pad_mode, "super" if args.super_model else "base",
            f"c{int(args.condition_u0)}{int(args.condition_uT)}",
        ])
        for lvl in levels:
            cache = os.path.join(args.data, f"states_{tag}_lvl{lvl}.npy")
            if not os.path.exists(cache):
                st, cs, _ = build_training_states(
                    db, level=lvl, is_super_model=args.super_model,
                    wave_type=args.wave_type, pad_mode=args.pad_mode,
                    is_condition_u0=args.condition_u0, is_condition_uT=args.condition_uT,
                    rescaler=rescaler,
                )
                np.save(cache, np.ascontiguousarray(st, dtype=np.float32))
                del st
            _, _, shape, _ = parse_npy_header(cache)
            shard_paths.append(cache)
            state_shapes.append(shape[1:])
            coef_shapes.append(list(db["coef"][lvl].shape[1:3]))
            print(f"level {lvl}: shard {cache} {shape}")
    else:  # raw (non-wavelet) mode, reference --is_wavelet False
        rescaler = None
        data = np.load(os.path.join(args.data, "train.npz"))
        tag = "raw_" + ("super" if args.super_model else "base")
        for lvl in levels:
            cache = os.path.join(args.data, f"states_{tag}_lvl{lvl}.npy")
            if not os.path.exists(cache):
                st, cs, _ = build_raw_states(
                    data["u"], data["f"], level=lvl, is_super_model=args.super_model,
                )
                np.save(cache, np.ascontiguousarray(st, dtype=np.float32))
                del st
            _, _, shape, _ = parse_npy_header(cache)
            shard_paths.append(cache)
            state_shapes.append(shape[1:])
            coef_shapes.append(
                [math_ceil(data["u"].shape[1], 2**lvl), math_ceil(data["u"].shape[2], 2**lvl)]
            )
            print(f"level {lvl}: shard {cache} {shape}")

    _, gds, state, cfg = _make_burgers_training(args, state_shapes, coef_shapes, rescaler)
    _train_with_loaders(args, gds, state, cfg, shard_paths)


def math_ceil(n: int, d: int) -> int:
    return -(-n // d)


def _resolve_checkpoint(outdir: str, name: str) -> str:
    """Map --checkpoint to an orbax dir; "latest" prefers model-final (a
    completed run) and otherwise the highest-numbered milestone, so partial
    reference-budget runs are evaluable mid-campaign."""
    import re

    if name == "latest":
        if os.path.isdir(os.path.join(outdir, "model-final")):
            name = "final"
        else:
            nums = [
                int(m.group(1))
                for n in os.listdir(outdir)
                if (m := re.fullmatch(r"model-(\d+)", n))
            ]
            if not nums:
                raise SystemExit(f"no model-* checkpoints in {outdir}")
            name = str(max(nums))
    path = os.path.abspath(os.path.join(outdir, f"model-{name}"))
    if not os.path.isdir(path):
        have = sorted(n for n in os.listdir(outdir) if n.startswith("model-"))
        raise SystemExit(f"no checkpoint {path}; available: {have}")
    return path


def cmd_eval_burgers(args):
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from .core.schedules import get_J_scheduler
    from .data.rescalers import burgers_wavelet_rescaler
    from .eval.burgers_eval import (
        BurgersEvalConfig, eval_control_batch, eval_sim_batch, super_res_chain,
    )
    from .eval.result_io import save_acc

    outdir = os.path.join(args.results, args.exp)
    cfg_json = json.load(open(os.path.join(outdir, "config.json")))
    ns = argparse.Namespace(**{**cfg_json, **{k: v for k, v in vars(args).items() if v is not None}})
    from .data.burgers_data import build_raw_states, build_training_states

    if ns.super_model:
        raise SystemExit(
            "a super (refinement) model cannot be evaluated standalone — it "
            "needs low-res conditions from a base sample; evaluate the base "
            "experiment and pass this one via --super_exp for the SR chain"
        )
    if ns.wavelet:
        db = _load_coef_db(
            os.path.join(args.data, f"coef_{ns.wave_type}_{ns.pad_mode}.npz"),
            probe=True,
        )
        rescaler = burgers_wavelet_rescaler(
            ns.wave_type, ns.pad_mode, is_super_model=ns.super_model,
            has_condition_channel=ns.condition_u0 or ns.condition_uT,
        )
        st0, coef_shape, ori_shape = build_training_states(
            db, level=0, wave_type=ns.wave_type, pad_mode=ns.pad_mode,
            is_condition_u0=ns.condition_u0, is_condition_uT=ns.condition_uT,
            rescaler=rescaler, max_samples=1,
        )
    else:  # raw (non-wavelet) mode
        if ns.super_model:
            raise SystemExit(
                "raw-mode super-model evaluation is not supported: "
                "make_raw_cond_state does not assemble the low-res/uT "
                "condition layout the raw super training states use "
                "(build_raw_states); evaluate the wavelet SR chain instead"
            )
        rescaler = None
        probe = np.load(os.path.join(args.data, "train.npz"))
        st0, coef_shape, ori_shape = build_raw_states(
            probe["u"], probe["f"], level=0, is_super_model=ns.super_model,
            max_samples=1,
        )
        ori_shape = [probe["u"].shape[1], probe["u"].shape[2]]
    model, gds, state, _ = _make_burgers_training(
        ns, [st0.shape[1:]], [coef_shape], rescaler
    )
    ckpt = ocp.StandardCheckpointer()
    ckpt_path = _resolve_checkpoint(outdir, args.checkpoint)
    state = ckpt.restore(ckpt_path, jax.device_get(state))
    gd = gds[0]
    gd.sampling_timesteps = args.ddim_steps
    gd.is_ddim_sampling = True
    gd.ddim_eta = args.ddim_eta

    test = np.load(os.path.join(args.data, "test.npz"))
    start = getattr(args, "start", 0) or 0
    u_t = jnp.asarray(test["u"][start : start + args.ntest])
    f_t = jnp.asarray(test["f"][start : start + args.ntest])
    ecfg = BurgersEvalConfig(
        rescaler=rescaler, coef_shape=tuple(coef_shape), ori_shape=tuple(ori_shape),
        wave_type=ns.wave_type, pad_mode=ns.pad_mode,
        is_condition_u0=ns.condition_u0, is_condition_uT=ns.condition_uT,
        is_condition_f=ns.condition_f, is_wavelet=ns.wavelet,
    )
    C = st0.shape[-1]

    # optional zero-shot super-resolution chain (reference eval_super_sim.sh)
    gd_super = state_super = ecfg_super = levels = u_hi = f_hi = None
    C_super = 0
    if args.super_exp:
        import dataclasses as _dc

        if not ns.wavelet:
            raise SystemExit(
                "the zero-shot SR chain conditions on upsampled wavelet "
                "coefficients; it requires a wavelet base experiment "
                "(reference eval_ddpm_burgers.py:305-338)"
            )
        sup_dir = os.path.join(args.results, args.super_exp)
        ns_sup = argparse.Namespace(**json.load(open(os.path.join(sup_dir, "config.json"))))
        res_sup = burgers_wavelet_rescaler(
            ns_sup.wave_type, ns_sup.pad_mode, is_super_model=True,
            has_condition_channel=ns_sup.condition_u0 or ns_sup.condition_uT,
        )
        st_s, cs_s, _ = build_training_states(
            db, level=0, is_super_model=True, wave_type=ns_sup.wave_type,
            pad_mode=ns_sup.pad_mode, is_condition_u0=ns_sup.condition_u0,
            is_condition_uT=ns_sup.condition_uT, rescaler=res_sup, max_samples=1,
        )
        _, gds_s, state_super, _ = _make_burgers_training(
            ns_sup, [st_s.shape[1:]], [cs_s], res_sup
        )
        state_super = ckpt.restore(
            _resolve_checkpoint(sup_dir, args.super_checkpoint),
            jax.device_get(state_super),
        )
        gd_super = gds_s[0]
        gd_super.sampling_timesteps = args.ddim_steps
        gd_super.is_ddim_sampling = True
        gd_super.ddim_eta = args.ddim_eta
        C_super = st_s.shape[-1]
        ecfg_super = _dc.replace(ecfg, rescaler=res_sup)
        hi = np.load(args.super_data)
        u_hi = jnp.asarray(hi["u"][start : start + args.ntest])
        f_hi = jnp.asarray(hi["f"][start : start + args.ntest])
        levels, (ot, ox) = [], tuple(ori_shape)
        for _k in range(args.upsample):
            ot, ox = (ot - 1) * 2 + 1, ox * 2
            levels.append((((ot + 1) // 2, (ox + 1) // 2), (ot, ox)))

    # --chunk: sweep the whole ntest range in ONE process (the coefficient/
    # test blobs take ~20 min to load, so per-chunk subprocesses pay that 8x)
    # while still writing one crash-recoverable eval_raw_*.npz per chunk and
    # skipping chunks a previous (possibly killed) sweep already produced.
    chunk = getattr(args, "chunk", None) or args.ntest
    task_tag = args.task + ("_sr" if args.super_exp else "")
    eval_mesh = _eval_mesh(args.batch_eval, getattr(args, 'shard_eval', 'auto'))
    for cs in range(0, args.ntest, chunk):
      chunk_path = os.path.join(outdir, f"eval_raw_{task_tag}_{start + cs}.npz")
      if chunk < args.ntest and os.path.exists(chunk_path):
        print(f"chunk {start + cs}: already done, skipping", flush=True)
        continue
      results = {}
      for i in range(cs, min(cs + chunk, args.ntest), args.batch_eval):
        rng = jax.random.PRNGKey(start + i)
        sl = slice(i, i + args.batch_eval)
        if args.task == "sim":
            r = eval_sim_batch(gd, state.ema_params, rng, ecfg,
                               u_target=u_t[sl], f_raw=f_t[sl], channels=C,
                               mesh=eval_mesh)
            results.setdefault("ddpm_mse", []).append(r["ddpm_mse"])
            if gd_super is not None:
                coef = jnp.asarray(r["coef"])[:, : coef_shape[0], : coef_shape[1], :]
                f_lvls = [
                    f_hi[sl, :: f_hi.shape[1] // (ot_k - 1), :: f_hi.shape[2] // ox_k]
                    for (_, (ot_k, ox_k)) in levels
                ]
                outs = super_res_chain(
                    gd_super, state_super.ema_params, jax.random.PRNGKey(10_000 + start + i),
                    ecfg_super, coef, levels=levels, u_target=u_hi[sl],
                    f_raw_per_level=f_lvls, channels=C_super,
                )
                for k2, rr in enumerate(outs):
                    results.setdefault(f"ddpm_mse_up{k2 + 1}", []).append(rr["ddpm_mse"])
                    for nm in ("linear", "nearest"):
                        results.setdefault(f"ddpm_mse_up{k2 + 1}_{nm}_sr", []).append(
                            rr[f"ddpm_mse_{nm}_sr"]
                        )
        else:
            r = eval_control_batch(
                gd, state.ema_params, rng, ecfg, u_target=u_t[sl],
                wu=args.wu, wf=args.wf,
                J_schedule=get_J_scheduler(args.J_scheduler, gd.num_timesteps),
                channels=C, report_all=args.report_all,
                solver_factor=args.solver_factor, mesh=eval_mesh,
            )
            for k, v in r.items():
                if k not in ("u", "f", "coef"):
                    results.setdefault(k, []).append(v)
        print(f"batch {i}: " + ", ".join(f"{k}={np.concatenate(v).mean():.6f}" for k, v in results.items()), flush=True)

      # raw per-chunk values: chunked runs (--start/--chunk) can be combined
      # exactly afterwards (aggregate-eval), and a crash mid-eval loses only
      # the current chunk.  Runs with the SR chain attached get their own tag
      # so their chunks don't collide with base-only chunks of the same task.
      np.savez(
          chunk_path, **{k: np.concatenate(v) for k, v in results.items()}
      )
      save_path = os.path.join(outdir, "eval_results.json")
      key = task_tag if start + cs == 0 else f"{task_tag}_start{start + cs}"
      for k, v in results.items():
          save_acc(np.concatenate(v), save_path, key, k)
      print("saved", save_path)
      for k, v in results.items():
          print(k, float(np.concatenate(v).mean()))


def cmd_datagen_smoke(args):
    from .data import smoke_data as _sd
    from .data.smoke_data import generate_smoke_batch
    from .solvers.smoke.scene import make_scene

    scene = make_scene()
    os.makedirs(args.out, exist_ok=True)
    per = args.batch
    start = args.start or 0
    # preallocate: accumulating per-batch lists + one concatenate peaked at
    # ~2x the dataset in host RSS (~108 GB transient at the 20k-scene scale)
    F = _sd.SCENE_LEN // args.record_stride + 1
    r = args.record_res
    out = {
        "Density": np.empty((args.n, F, r, r), np.float32),
        "Velocity": np.empty((args.n, F, r, r, 2), np.float32),
        "Control": np.empty((args.n, F, r, r, 2), np.float32),
        "Smoke": np.empty((args.n, F, 8), np.float32),
    }
    for i in range(start, start + args.n, per):
        b = min(per, start + args.n - i)
        # test scenes come from a disjoint (seed, index) stream — with the
        # train seed they would be byte-identical to the first n train
        # scenes (the Burgers datagen applies the same +1 offset)
        fields = generate_smoke_batch(
            args.seed if args.split == "train" else args.seed + 1,
            b, scene, start=i,
            record_stride=args.record_stride, record_res=args.record_res)
        for k, v in fields.items():
            out[k][i - start : i - start + b] = v
        print(f"{i + b - start}/{args.n}", flush=True)
    # --part: write an index-stamped part file instead of {split}.npz so a
    # long generation can be chunked and crash-recovered (scenes are pure
    # functions of (seed, global index), so chunking never changes content);
    # merge-smoke-data concatenates parts into the canonical {split}.npz
    name = f"{args.split}_part{start}.npz" if args.part else f"{args.split}.npz"
    np.savez(os.path.join(args.out, name), **out)
    print("saved", name, {k: v.shape for k, v in out.items()})


def cmd_merge_smoke_data(args):
    """Concatenate chunked datagen-smoke --part outputs into {split}.npz."""
    import glob as _glob
    import re as _re

    pat = _re.compile(_re.escape(f"{args.split}_part") + r"(\d+)\.npz$")
    parts = sorted(
        (p for p in _glob.glob(os.path.join(args.data, f"{args.split}_part*.npz"))
         if pat.search(os.path.basename(p))),
        key=lambda p: int(pat.search(os.path.basename(p)).group(1)),
    )
    if not parts:
        raise SystemExit(f"no {args.split}_part*.npz under {args.data}")
    starts = [int(pat.search(os.path.basename(p)).group(1)) for p in parts]
    blobs = [np.load(p) for p in parts]
    pos = 0
    for s, z in zip(starts, blobs):
        if s != pos:
            raise SystemExit(f"parts are not contiguous: expected start {pos}, got {s}")
        pos += z["Density"].shape[0]
    out = {k: np.concatenate([z[k] for z in blobs]) for k in blobs[0].files}
    np.savez(os.path.join(args.data, f"{args.split}.npz"), **out)
    print("merged", len(parts), "parts ->", f"{args.split}.npz",
          {k: v.shape for k, v in out.items()})
    if args.remove_parts:
        for p in parts:
            os.remove(p)


def cmd_prep_smoke(args):
    from .data.loader import npz_member_memmap
    from .data.smoke_data import build_smoke_coef

    path = os.path.join(args.data, f"{args.split}.npz")
    z = np.load(path)
    try:
        # map members in place (np.savez stores them uncompressed) — the
        # 26 GB 10k-scene raw split must never be materialized in host RAM
        # (the whole-dict load OOM-killed the r3 train prep); the chunked
        # builder slices lazily
        fields = {k: npz_member_memmap(path, k) for k in z.files}
    except ValueError:  # compressed npz (e.g. small test fixtures)
        fields = {k: z[k] for k in z.files}
    levels = ([int(v) for v in args.levels.split(",")]
              if getattr(args, "levels", None) else None)
    for ds_type in args.types.split(","):
        db = build_smoke_coef(
            fields, wave_type=args.wave_type, pad_mode=args.pad_mode,
            n_downsample=args.n_downsample, downsample_type=ds_type,
            levels=levels,
        )
        # --levels writes a *supplemental* blob (absolute level indices in a
        # `levels` member) next to the standard one: the super-model prep
        # reuses the existing 33 GB level-0 npz instead of rewriting it —
        # there is not enough free disk to hold two copies of level 0.
        tag = f"_lvl{'-'.join(str(v) for v in levels)}" if levels else ""
        out = os.path.join(
            args.data,
            f"coef_{args.wave_type}_{args.pad_mode}_{ds_type}{tag}_{args.split}.npz",
        )
        np.savez(
            out,
            **{f"coef_{i}": c for i, c in enumerate(db["coef"])},
            **{f"init_{i}": c for i, c in enumerate(db["init"])},
            **{f"smokeout_{i}": c for i, c in enumerate(db["smokeout"])},
            shape=np.asarray(db["shape"]),
            ori_shape=np.asarray(db["ori_shape"]),
            n_levels=len(db["coef"]),
            levels=np.asarray(db["levels"]),
        )
        print("saved", out)


def cmd_train_smoke(args):
    import jax
    import jax.numpy as jnp

    from .core.conditioning import smoke_spec
    from .core.diffusion import GaussianDiffusion
    from .core.schedules import make_schedule
    from .data.loader import parse_npy_header
    from .data.rescalers import smoke_wavelet_rescaler
    from .data.smoke_data import build_smoke_states
    from .models.unet3d import UNet3D
    from .train.state import TrainConfig, create_train_state

    if not args.wavelet:  # raw mode: [32, 64, 64, 6] states, reference Smoke dataset
        from .data.smoke_data import build_smoke_raw_states

        if args.super_model:
            raise SystemExit("raw (non-wavelet) mode has no super model (reference parity)")
        z = np.load(os.path.join(args.data, "train.npz"))
        cache = os.path.join(args.data, "states_raw.npy")
        if not os.path.exists(cache):
            st = build_smoke_raw_states({k: z[k] for k in z.files})
            np.save(cache, np.ascontiguousarray(st, dtype=np.float32))
            del st
        if getattr(args, "states_only", False):
            print("states cache ready; exiting (--states_only)")
            return
        _, _, full_shape, _ = parse_npy_header(cache)
        spec = smoke_spec(full_shape[1:], full_shape[1:4], is_wavelet=False,
                          is_condition_control=args.condition_control,
                          is_condition_pad=getattr(args, "condition_pad", True))
        model = UNet3D(dim=args.dim, dim_mults=tuple(args.dim_mults),
                       channels=full_shape[-1],
                       dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
        sched = make_schedule("sigmoid", args.timesteps)
        cfg = TrainConfig(learning_rate=args.lr, lr_schedule="multistep",
                          train_num_steps=args.steps,
                          gradient_accumulate_every=getattr(args, "grad_accum", 1))
        gd = GaussianDiffusion(model.apply, sched, state_shape=full_shape[1:], spec=spec)
        x0 = jnp.zeros((args.batch,) + full_shape[1:])
        params = jax.jit(model.init)(jax.random.PRNGKey(args.seed), x0,
                                     jnp.zeros((args.batch,), jnp.int32))
        state = create_train_state(params, cfg)
        _train_with_loaders(args, [gd], state, cfg, [cache])
        return

    from .data.loader import npz_member_memmap

    ds_type = "space" if args.condition_control else "time"
    path = os.path.join(args.data, f"coef_{args.wave_type}_{args.pad_mode}_{ds_type}_train.npz")
    z = np.load(path)
    n = int(z["n_levels"])
    maxn = getattr(args, "max_train_samples", None)
    db = None

    # The super model at level l conditions on level l+1, so training
    # levels 0..n_downsample-1 needs coefficient levels 0..n_downsample;
    # the base model trains level 0 only.  Levels beyond the main npz come
    # from supplemental `_lvlA-B` blobs (prep-smoke --levels): level 0
    # alone is 33 GB on the reference-budget split, so the prep appends
    # new levels in a second file instead of rewriting the first.
    need = (args.n_downsample + 1) if args.super_model else 1
    sup_level_src = {}  # absolute level -> (path, position-in-file)
    if need > n:
        import glob as _glob

        pat = os.path.join(
            args.data,
            f"coef_{args.wave_type}_{args.pad_mode}_{ds_type}_lvl*_train.npz",
        )
        for sp in sorted(_glob.glob(pat)):
            zs = np.load(sp)
            for pos, lv in enumerate(np.asarray(zs["levels"]).tolist()):
                sup_level_src.setdefault(int(lv), (sp, pos))
        missing = [l for l in range(n, need) if l not in sup_level_src]
        if missing:
            raise SystemExit(
                f"coef levels {missing} not found: {path} has levels 0..{n - 1} "
                f"and no supplemental npz matching {pat} provides them — run "
                f"`prep-smoke --types {ds_type} --levels "
                f"{','.join(str(l) for l in missing)}` first"
            )

    def _member(p, name):
        try:  # uncompressed savez: map in place, never materialize
            return npz_member_memmap(p, name)
        except ValueError:
            return np.load(p)[name]

    def _level_meta(lvl, key):
        if lvl < n:
            return list(np.asarray(z[key])[lvl])
        sp, pos = sup_level_src[lvl]
        return list(np.asarray(np.load(sp)[key])[pos])

    def load_db():
        # Deferred: only needed when a states cache is missing — a trainer
        # resume must not pay minutes of npz reads just to re-read shapes
        # that z["shape"] already stores.  Members are memmapped; the
        # chunked states builder slices lazily.
        nonlocal db
        if db is None:
            coef, init, smoke, shp, ori = [], [], [], [], []
            for lvl in range(need):
                if lvl < n:
                    src, pos = path, lvl
                else:
                    src, pos = sup_level_src[lvl]
                coef.append(_member(src, f"coef_{pos}"))
                init.append(_member(src, f"init_{pos}"))
                smoke.append(_member(src, f"smokeout_{pos}"))
                shp.append(_level_meta(lvl, "shape"))
                ori.append(_level_meta(lvl, "ori_shape"))
            db = {"coef": coef, "init": init, "smokeout": smoke,
                  "shape": shp, "ori_shape": ori}
            if maxn:  # cap scenes (e.g. to keep multi-level super states on disk)
                for k in ("coef", "init", "smokeout"):
                    db[k] = [a[:maxn] for a in db[k]]
        return db

    rescaler = smoke_wavelet_rescaler(args.wave_type, is_super_model=args.super_model)
    levels = list(range(args.n_downsample)) if args.super_model else [0]
    tag = "_".join([
        args.wave_type, args.pad_mode, ds_type,
        "super" if args.super_model else "base",
    ] + ([f"n{maxn}"] if maxn else []))
    shard_paths, specs, state_shapes = [], [], []
    # Base model with no materialized states cache: stream a device-resident
    # reservoir straight off the memmapped coef npz instead of writing a
    # dataset-sized (2x-padded) cache to disk.  The 10k-scene reference-
    # budget split is ~33 GB of coefficients / ~65 GB of states — neither
    # fits HBM nor survives per-step tunnel transfers (the client leaks
    # ~95% of transferred bytes into host RSS); the reservoir bounds both.
    stream = (
        not getattr(args, "states_only", False)
        and not getattr(args, "host_data", False)
        and not os.path.exists(os.path.join(args.data, f"states_{tag}_lvl0.npy"))
        # super streaming needs every coefficient level resolvable (main
        # npz or supplemental blobs — validated above)
        and (not args.super_model or all(
            lvl < n or lvl in sup_level_src for lvl in range(need)))
    )
    if stream and args.super_model:
        # one aligned-slab reservoir per training level: level-l target +
        # level-l+1 condition gathered for the same scenes, 82-channel
        # states built in the jitted gather (no states caches on disk)
        for lvl in levels:
            shape = [int(v) for v in _level_meta(lvl, "shape")]
            if ds_type == "time":
                st = (24 // 2 ** lvl, 40, 40, 82)
                cs = [shape[0] + 2, shape[1], shape[2]]
            else:
                st = (24, 40 // 2 ** lvl, 40 // 2 ** lvl, 82)
                cs = [shape[0], shape[1] + 2, shape[2] + 2]
            state_shapes.append(st)
            specs.append(smoke_spec(
                st, cs, is_condition_control=args.condition_control,
                is_super_model=True,
                is_condition_pad=getattr(args, "condition_pad", True),
            ))
            print(f"level {lvl}: streaming super reservoir {shape} -> {st}")
    elif stream:
        shape = [int(v) for v in np.asarray(z["shape"])[0]]
        # The streaming transform pads coefficients to the fixed published
        # state geometry; a nonstandard prep (larger nt'/nx') would only
        # blow up later inside the jitted pad_to, far from this decision
        # (ADVICE r3) — fall back to the materialized path here instead.
        pads = (24, 40, 40)
        if any(s > p for s, p in zip(shape, pads)):
            print(f"coef shape {shape} exceeds streaming pad targets {pads}; "
                  "using the materialized states path")
            stream = False
    if stream and not args.super_model:
        state_shapes = [(24, 40, 40, 42)]
        specs = [smoke_spec(
            state_shapes[0], shape, is_condition_control=args.condition_control,
            is_condition_pad=getattr(args, "condition_pad", True),
        )]
        print(f"level 0: streaming reservoir over {path} {shape}")
    for lvl in (() if stream else levels):
        cache = os.path.join(args.data, f"states_{tag}_lvl{lvl}.npy")
        if not os.path.exists(cache):
            st, _, _ = build_smoke_states(
                load_db(), level=lvl, is_super_model=args.super_model,
                downsample_type=ds_type, rescaler=rescaler,
            )
            np.save(cache, np.ascontiguousarray(st, dtype=np.float32))
            del st
        shape = [int(v) for v in _level_meta(lvl, "shape")]
        _, _, full_shape, _ = parse_npy_header(cache)
        bump = (0, 2, 2) if args.condition_control else (2, 0, 0)
        cs = [shape[i] + (bump[i] if args.super_model else 0) for i in range(3)]
        specs.append(smoke_spec(
            full_shape[1:], cs, is_condition_control=args.condition_control,
            is_super_model=args.super_model,
            is_condition_pad=getattr(args, "condition_pad", True),
        ))
        shard_paths.append(cache)
        state_shapes.append(full_shape[1:])
        print(f"level {lvl}: shard {cache} {full_shape}")

    if getattr(args, "states_only", False):
        print("states caches ready; exiting (--states_only)")
        return

    C = state_shapes[0][-1]
    model = UNet3D(dim=args.dim, dim_mults=tuple(args.dim_mults), channels=C,
                   dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    sched = make_schedule("sigmoid", args.timesteps)
    cfg = TrainConfig(learning_rate=args.lr, lr_schedule="multistep",
                      train_num_steps=args.steps,
                      gradient_accumulate_every=getattr(args, "grad_accum", 1))
    gds = [GaussianDiffusion(model.apply, sched, state_shape=state_shapes[i],
                             spec=specs[i], loss_channel_weight=None)
           for i in range(len(state_shapes))]

    x0 = jnp.zeros((args.batch,) + state_shapes[0])
    params = jax.jit(model.init)(jax.random.PRNGKey(args.seed), x0,
                                 jnp.zeros((args.batch,), jnp.int32))
    state = create_train_state(params, cfg)
    loaders = None
    if stream:
        from .data.smoke_data import (
            make_streaming_smoke_loader, make_streaming_smoke_super_loader,
        )

        rkw = {}
        for env, key, mul in (("WDNO_RESERVOIR_GB", "device_budget_bytes", 1e9),
                              ("WDNO_REFRESH_GB", "refresh_budget_bytes", 1e9),
                              ("WDNO_REFRESH_S", "refresh_interval_s", 1.0)):
            if os.environ.get(env):
                rkw[key] = float(os.environ[env]) * mul
        if args.super_model:
            sources = {}
            for lvl in range(need):
                sources[lvl] = (path, lvl) if lvl < n else sup_level_src[lvl]
            # split the device/refresh budgets across levels by their
            # (target + condition) row bytes — level 0 dominates ~4:1
            row_b = []
            for lvl in levels:
                b = 0
                for l2 in (lvl, lvl + 1):
                    b += int(np.prod(_level_meta(l2, "shape"))) * 40 * 4
                row_b.append(b)
            tot_b = sum(row_b)
            loaders = []
            for i, lvl in enumerate(levels):
                lkw = dict(rkw)
                for key in ("device_budget_bytes", "refresh_budget_bytes"):
                    if key in lkw:
                        lkw[key] = lkw[key] * row_b[i] / tot_b
                loaders.append(make_streaming_smoke_super_loader(
                    sources, lvl, args.batch, rescaler=rescaler,
                    downsample_type=ds_type, seed=args.seed + lvl,
                    max_items=maxn, **lkw))
        else:
            loaders = [make_streaming_smoke_loader(
                path, args.batch, rescaler=rescaler, seed=args.seed,
                max_items=maxn, **rkw)]
    _train_with_loaders(args, gds, state, cfg, shard_paths, loaders=loaders)


def _sim_eval_frames(chunk, n_frames: int):
    """Frames for the sim-task metric: subsample a stride-1 recording
    (>= 8*n_frames frames) down to the training record stride 8; shorter
    (already-strided) splits pass through.  Returns [B, n_frames, ...]."""
    if chunk.shape[1] >= 8 * n_frames:
        chunk = chunk[:, ::8]
    return chunk[:, :n_frames]


def cmd_eval_smoke(args):
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from .core.conditioning import smoke_spec
    from .core.diffusion import GaussianDiffusion
    from .core.schedules import make_schedule
    from .data.rescalers import smoke_wavelet_rescaler
    from .eval.result_io import save_acc
    from .eval.smoke_eval import (
        SmokeEvalConfig, eval_smoke_control, eval_smoke_sim, smoke_super_res_chain,
    )
    from .models.unet3d import UNet3D
    from .solvers.smoke.scene import make_scene
    from .train.state import TrainConfig, create_train_state

    outdir = os.path.join(args.results, args.exp)
    cfg_json = json.load(open(os.path.join(outdir, "config.json")))
    ns = argparse.Namespace(**cfg_json)

    is_sim = args.task == "sim"
    is_wavelet = getattr(ns, "wavelet", True)
    if ns.super_model:
        raise SystemExit(
            "a super (refinement) model cannot be evaluated standalone — it "
            "needs low-res conditions from a base sample; evaluate the base "
            "experiment and pass this one via --super_exp for the SR chain"
        )
    if is_wavelet:
        C = 42
        state_shape = (24, 40, 40, C)
        rescaler = smoke_wavelet_rescaler(ns.wave_type)
        spec = smoke_spec(state_shape, (18, 34, 34),
                          is_condition_control=ns.condition_control,
                          is_condition_pad=getattr(ns, "condition_pad", True))
    else:  # raw (non-wavelet) mode: physical states, reference [32, 64, 64, 6]
        from .data.rescalers import smoke_raw_rescaler

        C = 6
        # Shape comes from the data (the train path derives it the same way),
        # so non-reference grids evaluate too; reference is 32 frames @ 64^2.
        dshape = np.load(os.path.join(args.data, f"{args.split}.npz"))["Density"].shape
        state_shape = (min(32, dshape[1]), dshape[2], dshape[3], C)
        rescaler = smoke_raw_rescaler()
        spec = smoke_spec(state_shape, state_shape[:3], is_wavelet=False,
                          is_condition_control=ns.condition_control,
                          is_condition_pad=getattr(ns, "condition_pad", True))
    n_frames = 32 if is_wavelet else state_shape[0]
    model = UNet3D(dim=ns.dim, dim_mults=tuple(getattr(ns, "dim_mults", (1, 2, 4))),
                   channels=C, dtype=jnp.bfloat16 if ns.bf16 else jnp.float32)
    sched = make_schedule("sigmoid", ns.timesteps)
    gd = GaussianDiffusion(
        model.apply, sched, state_shape=state_shape, spec=spec,
        sampling_timesteps=args.ddim_steps, ddim_eta=args.ddim_eta,
    )
    x0 = jnp.zeros((1,) + state_shape)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32))
    tcfg = TrainConfig()
    state = create_train_state(params, tcfg)
    ckpt = ocp.StandardCheckpointer()
    ckpt_path = _resolve_checkpoint(outdir, args.checkpoint)
    state = ckpt.restore(
        ckpt_path,
        jax.device_get(state),
    )

    start = getattr(args, "start", 0) or 0
    z = np.load(os.path.join(args.data, f"{args.split}.npz"))
    s_ratio = z["Smoke"][:, :, 1] / z["Smoke"].sum(-1)
    test_state = np.stack(
        [z["Density"], z["Velocity"][..., 0], z["Velocity"][..., 1],
         z["Control"][..., 0], z["Control"][..., 1],
         np.broadcast_to(s_ratio[:, :, None, None], z["Density"].shape)], axis=2,
    )[start : start + args.ntest]
    if test_state.shape[0] == 0:
        raise SystemExit(f"--start {start} is past the test set")
    ecfg = SmokeEvalConfig(
        rescaler=rescaler, wave_type=ns.wave_type, pad_mode=ns.pad_mode,
        is_condition_control=ns.condition_control, is_wavelet=is_wavelet,
    )
    if not is_wavelet:  # raw mode works directly on the data grid
        ecfg = dataclasses.replace(ecfg, ori_shape=state_shape[:3])
    scene = make_scene()

    # optional zero-shot spatial super-resolution (reference inf_super_sim.sh)
    gd_super = state_super = ecfg_super = None
    C_super = 0
    if args.super_exp:
        import dataclasses as _dc

        sup_dir = os.path.join(args.results, args.super_exp)
        ns_sup = argparse.Namespace(**json.load(open(os.path.join(sup_dir, "config.json"))))
        C_super = 82
        model_s = UNet3D(dim=ns_sup.dim,
                         dim_mults=tuple(getattr(ns_sup, "dim_mults", (1, 2, 4))),
                         channels=C_super,
                         dtype=jnp.bfloat16 if ns_sup.bf16 else jnp.float32)
        res_sup = smoke_wavelet_rescaler(ns_sup.wave_type, is_super_model=True)
        gd_super = GaussianDiffusion(
            model_s.apply, make_schedule("sigmoid", ns_sup.timesteps),
            state_shape=(24, 40, 40, C_super), spec=None,
            sampling_timesteps=args.ddim_steps, ddim_eta=args.ddim_eta,
        )
        x0s = jnp.zeros((1, 24, 40, 40, C_super))
        params_s = jax.jit(model_s.init)(jax.random.PRNGKey(0), x0s, jnp.zeros((1,), jnp.int32))
        state_super = create_train_state(params_s, TrainConfig())
        state_super = ckpt.restore(
            _resolve_checkpoint(sup_dir, args.super_checkpoint),
            jax.device_get(state_super),
        )
        ecfg_super = _dc.replace(ecfg, rescaler=res_sup)

    results = {}
    eval_mesh = _eval_mesh(args.batch_eval, getattr(args, 'shard_eval', 'auto'))
    keys = ("J_total", "J_target", "J_energy", "mse", "mse_wo_smoke", "n_l2")
    for i in range(0, test_state.shape[0], args.batch_eval):
        chunk = jnp.asarray(test_state[i : i + args.batch_eval])
        rng = jax.random.PRNGKey(start + i)
        if is_sim:
            # A stride-1 recorded split (the control protocol's 257-frame
            # recording, needed for re-simulation) must be subsampled to
            # the TRAINING record stride before frame slicing — the first
            # 32 raw frames are a different temporal window than the 32
            # stride-8 frames the model trained on.  A stride-8 split
            # (33 frames) passes through unchanged.
            sim_chunk = _sim_eval_frames(chunk, n_frames)
            r = eval_smoke_sim(gd, state.ema_params, rng, ecfg,
                               test_state=sim_chunk, channels=C,
                               mesh=eval_mesh)
            if gd_super is not None:
                outs = smoke_super_res_chain(
                    gd_super, state_super.ema_params, jax.random.PRNGKey(10_000 + start + i),
                    ecfg_super, jnp.asarray(r["coef"]),
                    test_state_hi=_sim_eval_frames(chunk, 32), n_levels=args.upsample,
                    channels=C_super, base_pred=jnp.asarray(r["pred"]),
                )
                for k2, rr in enumerate(outs):
                    for mk in ("mse", "n_l2", "mse_nearest_sr", "mse_linear_sr",
                               "n_l2_nearest_sr", "n_l2_linear_sr"):
                        if mk in rr:
                            results.setdefault(f"{mk}_up{k2 + 1}", []).append(rr[mk])
        else:
            big = (jnp.repeat(chunk[:, :n_frames], 8, axis=1)
                   if chunk.shape[1] < 256 else chunk)
            r = eval_smoke_control(
                gd, state.ema_params, rng, ecfg, scene, test_state=big,
                channels=C, standard_fixed_ratio=args.standard_fixed_ratio,
                design_guidance=getattr(args, "design_guidance", "standard"),
                coeff_ratio=getattr(args, "coeff_ratio", 0.0),
                w_init=args.w_init, w_energy=args.w_energy, mesh=eval_mesh,
            )
        for k in keys:
            if k in r:
                results.setdefault(k, []).append(r[k])
        print(f"batch {i}: " + ", ".join(
            f"{k}={np.concatenate(v).mean():.5f}" for k, v in results.items()), flush=True)
    # raw per-chunk values (same contract as eval-burgers): chunked runs
    # (--start) combine exactly afterwards via aggregate-eval
    task_tag = args.task + ("_sr" if args.super_exp else "")
    np.savez(
        os.path.join(outdir, f"eval_raw_{task_tag}_{start}.npz"),
        **{k: np.concatenate(v) for k, v in results.items()},
    )
    save_path = os.path.join(outdir, "eval_results.json")
    key = task_tag if start == 0 else f"{task_tag}_start{start}"
    for k, v in results.items():
        save_acc(np.concatenate(v), save_path, key, k)
    print("saved", save_path)


def cmd_aggregate_eval(args):
    """Combine chunked eval runs into final statistics.

    Chunked evals (``eval-burgers --start S --ntest N``) each write their raw
    per-sample metric values to ``eval_raw_{task}_{S}.npz`` (reference has no
    chunking — its eval either finishes Ntest=8000 in one process or loses
    everything, ``eval_ddpm_burgers.py:378-428``).  This command concatenates
    every chunk's raw values and stores exact whole-run {mean, std, median,
    p90} under the plain task key of ``eval_results.json``, as if the eval
    had run un-chunked.

    Chunks may come from several producers (the TPU loop's 1000-sample
    blocks and the CPU fallback's 50-sample chunks) and may overlap after a
    race; sample ``i`` of a chunk starting at ``S`` is always global sample
    ``S+i``, so overlaps are deduplicated exactly (first writer in
    ascending-start order wins) and, with ``--expect_ntest N``, coverage of
    [0, N) is verified before any statistic is written.
    """
    import glob as _glob
    import re as _re

    from .eval.result_io import save_acc

    outdir = os.path.join(args.results, args.exp)
    # strict match: chunk files are eval_raw_{task}_{start}.npz with a
    # numeric start — a bare glob for task "sim" would also pick up the
    # separately-tagged "sim_sr" chain chunks
    pat = _re.compile(_re.escape(f"eval_raw_{args.task}_") + r"(\d+)\.npz$")
    paths = sorted(
        (p for p in _glob.glob(os.path.join(outdir, f"eval_raw_{args.task}_*.npz"))
         if pat.search(os.path.basename(p))),
        key=lambda p: int(p.rsplit("_", 1)[1][:-4]),
    )
    if not paths:
        raise SystemExit(f"no eval_raw_{args.task}_*.npz chunks under {outdir}")
    # owner[global_sample] = (chunk_idx, offset); ascending-start order, so
    # on overlap the earlier-starting chunk keeps its samples
    chunks, owner = [], {}
    for p in paths:
        start = int(p.rsplit("_", 1)[1][:-4])
        with np.load(p) as z:
            data = {k: z[k] for k in z.files}
        if not data:
            continue  # empty reservation placeholder, not a finished chunk
        lens = {len(v) for v in data.values()}
        if len(lens) != 1:
            raise SystemExit(f"{p}: metrics disagree on sample count {sorted(lens)}")
        n = lens.pop()
        idx = len(chunks)
        chunks.append((start, n, data, os.path.basename(p)))
        for off in range(n):
            owner.setdefault(start + off, (idx, off))
    if not chunks:
        raise SystemExit(f"only empty placeholder chunks under {outdir}")
    covered = sorted(owner)
    total = sum(n for _, n, _, _ in chunks)
    dropped = total - len(covered)
    if dropped:
        print(f"overlap: {dropped} duplicated samples dropped (first chunk wins)")
    gaps = []
    lo = covered[0]
    for a, b in zip(covered, covered[1:]):
        if b != a + 1:
            gaps.append((a + 1, b))
    span = f"[{covered[0]}, {covered[-1] + 1})"
    print(f"chunks: {[(c[0], c[1]) for c in chunks]}; {len(covered)} samples in {span}")
    if args.expect_ntest is not None:
        want = set(range(args.expect_ntest))
        missing = sorted(want - set(covered))
        if missing or covered[0] != 0:
            ranges, s0 = [], missing[0]
            prev = s0
            for m in missing[1:]:
                if m != prev + 1:
                    ranges.append((s0, prev + 1))
                    s0 = m
                prev = m
            ranges.append((s0, prev + 1))
            raise SystemExit(
                f"coverage of [0, {args.expect_ntest}) incomplete: "
                f"{len(missing)} samples missing in ranges {ranges[:20]}"
            )
    elif gaps:
        print(f"WARNING: gaps between covered samples: {gaps[:20]}")
    keys = sorted({k for _, _, data, _ in chunks for k in data})
    save_path = os.path.join(outdir, "eval_results.json")
    for k in keys:
        vals = []
        for g in covered:
            idx, off = owner[g]
            data = chunks[idx][2]
            if k not in data:
                raise SystemExit(
                    f"metric {k!r} missing from chunk {chunks[idx][3]} — "
                    "chunks were produced by incompatible eval configs"
                )
            vals.append(data[k][off])
        vals = np.asarray(vals)
        save_acc(vals, save_path, args.task, k)
        print(f"{k}: n={len(vals)} mean={vals.mean():.6g} std={vals.std():.6g} "
              f"median={np.median(vals):.6g} p90={np.percentile(vals, 90):.6g}")
    print("saved", save_path)


def cmd_convert_torch(args):
    """Convert a reference torch checkpoint into an evaluable experiment:
    writes ``results/<exp>/config.json`` (from the matching train parser's
    defaults + the forwarded flags) and an orbax ``model-converted``
    TrainState whose params AND ema_params are the converted denoiser
    weights, so ``eval-* --exp <exp> --checkpoint converted`` runs the
    reference model on TPU (SURVEY §7 hard part #6)."""
    import jax
    import orbax.checkpoint as ocp

    from .train.state import TrainConfig, create_train_state
    from .utils.torch_convert import load_reference_checkpoint

    train_cmd = "train-burgers" if args.arch == "unet2d" else "train-smoke"
    extra = [a for a in args.train_args if a != "--"]
    tns = _build_parser().parse_args(
        [train_cmd, "--exp", args.exp, "--results", args.results, *extra]
    )
    params = load_reference_checkpoint(
        args.ckpt, model=args.arch, dim_mults=tuple(tns.dim_mults),
        use_ema=args.use_ema,
    )
    state = create_train_state(params, TrainConfig(learning_rate=tns.lr))
    outdir = os.path.join(args.results, args.exp)
    os.makedirs(outdir, exist_ok=True)
    json.dump({k: v for k, v in vars(tns).items() if k != "fn"},
              open(os.path.join(outdir, "config.json"), "w"), indent=1)
    ckpt = ocp.StandardCheckpointer()
    path = os.path.abspath(os.path.join(outdir, "model-converted"))
    ckpt.save(path, jax.device_get(state), force=True)
    ckpt.wait_until_finished()
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"converted {args.ckpt} ({args.arch}, {n / 1e6:.1f}M params) -> {path}")



def cmd_export_ckpt(args):
    """Export a trained experiment to one committable .npz: params + EMA
    (float16 by default -- ~4x smaller than the orbax TrainState, which also
    carries Adam moments) + step + the experiment config.json.  Persistence
    across workspace wipes: results/ and data/ are disposable, the npz lives
    in git (see import-ckpt)."""
    import jax
    import orbax.checkpoint as ocp

    outdir = os.path.join(args.results, args.exp)
    # same resolution rule as _resolve_checkpoint: "latest" prefers
    # model-final (a completed run), else the highest numeric milestone
    path = _resolve_checkpoint(outdir, args.milestone)
    tree = ocp.StandardCheckpointer().restore(path)

    flat = {}

    def put(prefix, sub):
        for kp, leaf in jax.tree_util.tree_flatten_with_path(sub)[0]:
            key = prefix + "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
            flat[key] = np.asarray(leaf)

    dt = np.dtype(args.dtype)
    if not args.ema_only:
        put("params:", jax.tree_util.tree_map(
            lambda x: np.asarray(x, dt) if np.issubdtype(np.asarray(x).dtype, np.floating) else x,
            tree["params"]))
    put("ema:", jax.tree_util.tree_map(
        lambda x: np.asarray(x, dt) if np.issubdtype(np.asarray(x).dtype, np.floating) else x,
        tree["ema_params"]))
    if args.include_opt:
        put("opt:", tree["opt_state"])
    flat["step"] = np.asarray(tree["step"])
    cfg_path = os.path.join(outdir, "config.json")
    if os.path.exists(cfg_path):
        flat["config_json"] = np.frombuffer(
            open(cfg_path, "rb").read(), dtype=np.uint8
        )
    os.makedirs(os.path.dirname(os.path.abspath(args.out)) or ".", exist_ok=True)
    np.savez_compressed(args.out, **flat)
    sz = os.path.getsize(args.out) / 1e6
    print(f"exported {path} (step {int(flat['step'])}) -> {args.out} ({sz:.0f} MB, {args.dtype})")


def _unflatten(flat, prefix):
    tree = {}
    for key, val in flat.items():
        if not key.startswith(prefix):
            continue
        parts = key[len(prefix):].split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(val, np.float32) if val.dtype == np.float16 else val
    return tree


def cmd_import_ckpt(args):
    """Recreate an evaluable/resumable experiment from an export-ckpt npz:
    writes results/<exp>/config.json and an orbax ``model-<milestone>``
    TrainState (fresh Adam moments unless the npz carries opt state --
    resumed training re-warms them over a few hundred steps)."""
    import jax
    import orbax.checkpoint as ocp

    from .train.state import TrainConfig, create_train_state

    flat = dict(np.load(args.npz, allow_pickle=False))
    params = _unflatten(flat, "params:")
    ema = _unflatten(flat, "ema:")
    if not params:  # --ema_only export: EMA weights stand in for params
        params = ema
    step = int(flat["step"])

    outdir = os.path.join(args.results, args.exp)
    os.makedirs(outdir, exist_ok=True)
    if "config_json" in flat:
        open(os.path.join(outdir, "config.json"), "wb").write(
            flat["config_json"].tobytes()
        )
        lr = json.loads(flat["config_json"].tobytes()).get("lr", 1e-4)
    else:
        lr = 1e-4
    state = create_train_state(params, TrainConfig(learning_rate=lr))
    state = state.replace(
        step=np.asarray(step, np.int32),
        ema_params=jax.tree_util.tree_map(np.asarray, ema),
    )
    milestone = args.milestone if args.milestone else str(step)
    path = os.path.abspath(os.path.join(outdir, f"model-{milestone}"))
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, jax.device_get(state), force=True)
    ckpt.wait_until_finished()
    print(f"imported {args.npz} (step {step}) -> {path}")


def cmd_render(args):
    """Render a trajectory from a dataset blob: Burgers space-time heatmap
    (PNG) or smoke density rollout (GIF + frame strip), obstacles overlaid —
    replaces the reference's ad-hoc gif/plot helpers
    (``evaluate_solver.py:228-367``)."""
    from .utils.viz import render_burgers_heatmap, render_smoke_frames, render_smoke_gif

    z = np.load(args.data)
    i = args.index
    if "Density" in z.files:  # smoke blob
        from .solvers.smoke.scene import make_scene

        d = z["Density"][i]
        mask = 1.0 - make_scene().fluid_mask[0, :, :, 0]
        if mask.shape[0] != d.shape[-1]:  # 127^2 scene vs 64^2 recording
            step = (mask.shape[0] + 1) // d.shape[-1]
            mask = mask[::step, ::step][: d.shape[-2], : d.shape[-1]]
        out = args.out or f"smoke_{i}.gif"
        print(render_smoke_gif(d, out, obstacles=mask))
        print(render_smoke_frames(d, os.path.splitext(out)[0] + "_frames.png",
                                  obstacles=mask))
    elif "u" in z.files:  # burgers blob
        out = args.out or f"burgers_{i}.png"
        print(render_burgers_heatmap(z["u"][i], out,
                                     f=z["f"][i] if "f" in z.files else None,
                                     title=f"#{i}"))
    else:
        raise SystemExit(f"{args.data}: neither a smoke nor a burgers blob "
                         f"(keys: {z.files})")


def cmd_doctor(args):
    """Environment diagnosis: backend, devices, HBM, native components,
    compile cache — the first thing to run on a new host."""
    import importlib.metadata as md
    import platform as plat

    print(f"python {plat.python_version()} on {plat.system()} {plat.machine()}")
    for pkg in ("jax", "jaxlib", "flax", "optax", "orbax-checkpoint", "numpy"):
        try:
            print(f"{pkg} {md.version(pkg)}")
        except md.PackageNotFoundError:
            print(f"{pkg} NOT INSTALLED")

    import subprocess
    import sys

    # probe the backend in a SUBPROCESS: a failed init error-caches in-process
    # and, on tunneled TPU hosts, takes ~20 min to fail (see RESULTS.md)
    probe = (
        "import os, jax;"
        "p = os.environ.get('WDNO_PLATFORM');"
        "p and jax.config.update('jax_platforms', p);"
        "ds = jax.devices();"
        "print(ds[0].platform, len(ds), [d.device_kind for d in ds][:2])"
    )
    try:
        r = subprocess.run([sys.executable, "-c", probe],
                           timeout=120, capture_output=True, text=True)
        ok = r.returncode == 0
        out = r.stdout.strip()
    except subprocess.TimeoutExpired:
        ok = False
    if ok:
        print("devices:", out)
    else:
        print("devices: UNREACHABLE (backend init failed/timed out — tunnel down?)")
        return

    import jax

    try:
        ms = jax.devices()[0].memory_stats() or {}
        if ms:
            print(f"HBM: {ms.get('bytes_in_use', 0) / 1e9:.2f} / "
                  f"{ms.get('bytes_limit', 0) / 1e9:.2f} GB in use")
        else:
            print("HBM: backend reports no memory stats")
    except Exception as e:
        print(f"HBM: unavailable ({type(e).__name__})")

    from .data import loader

    lib = loader._build_native()
    print("native shard loader:", "OK" if lib is not None else
          "UNAVAILABLE (g++ build failed; python mmap fallback active)")
    cache = jax.config.jax_compilation_cache_dir
    print("compile cache:", cache or "DISABLED")
    print(f"virtual mesh: XLA_FLAGS={os.environ.get('XLA_FLAGS', '')!r}, "
          f"device_count={jax.device_count()}")


def _build_parser():
    ap = argparse.ArgumentParser(prog="wdno_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = _add_common(sub.add_parser("datagen-burgers"))
    p.add_argument("--n_train", type=int, default=40000)
    p.add_argument("--n_test", type=int, default=8000)
    p.add_argument("--nt", type=int, default=80)
    p.add_argument("--nx", type=int, default=120)
    p.add_argument("--super_factor", type=int, default=16)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--out", type=str, default="data/1d")
    p.set_defaults(fn=cmd_datagen_burgers)

    p = _add_common(sub.add_parser("prep-burgers"))
    p.add_argument("--data", type=str, default="data/1d")
    p.add_argument("--wave_type", type=str, default="bior2.4")
    p.add_argument("--pad_mode", type=str, default="periodization")
    p.add_argument("--n_downsample", type=int, default=4)
    p.set_defaults(fn=cmd_prep_burgers)

    p = _add_common(sub.add_parser("train-burgers"))
    p.add_argument("--data", type=str, default="data/1d")
    p.add_argument("--exp", type=str, default="base_sim")
    p.add_argument("--wavelet", type=lambda s: s == "True", default=True,
                   help="False: raw (non-wavelet) physical-space states")
    p.add_argument("--wave_type", type=str, default="bior2.4")
    p.add_argument("--pad_mode", type=str, default="periodization")
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--dim_mults", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--steps", type=int, default=100000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--timesteps", type=int, default=1000)
    p.add_argument("--beta_schedule", type=str, default="cosine")
    p.add_argument("--condition_u0", type=lambda s: s == "True", default=True)
    p.add_argument("--condition_uT", type=lambda s: s == "True", default=False)
    p.add_argument("--condition_f", type=lambda s: s == "True", default=True)
    p.add_argument("--condition_pad", type=lambda s: s == "True", default=True,
                   help="hold padded locations at zero during diffusion "
                        "(reference --is_condition_pad)")
    p.add_argument("--resnet_block_groups", type=int, default=1,
                   help="GroupNorm group count in UNet ResNet blocks")
    p.add_argument("--super_model", type=lambda s: s == "True", default=False)
    p.add_argument("--n_downsample", type=int, default=3)
    p.add_argument("--grad_accum", type=int, default=1)
    p.add_argument("--bf16", type=lambda s: s == "True", default=True)
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--ckpt_every", type=int, default=10000)
    p.add_argument("--resume", action="store_true",
                   help="resume from the newest milestone in results/exp")
    p.add_argument("--overwrite", action="store_true",
                   help="replace an existing experiment id")
    p.add_argument("--host_data", action="store_true",
                   help="force host shard loaders (skip device-resident input)")
    p.add_argument("--model_parallel", type=int, default=1,
                   help="tensor-parallel degree: shard conv/dense kernel "
                        "out-channels over a 'model' mesh axis of this size "
                        "(devices = data x model)")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-3-style fully-sharded state: additionally "
                        "shard kernel in-channels + Adam moments + EMA over "
                        "the 'data' axis (XLA all-gathers weights per layer)")
    p.add_argument("--context_parallel", action="store_true",
                   help="spend the 'model' mesh axis on the batch's "
                        "sequence (frame/time) dimension instead of kernel "
                        "channels (requires --model_parallel > 1)")
    p.add_argument("--trace_dir", type=str, default=None,
                   help="capture a jax.profiler trace of a few steady-state "
                        "train steps into this directory (Perfetto-compatible)")
    p.set_defaults(fn=cmd_train_burgers)

    p = _add_common(sub.add_parser("eval-burgers"))
    p.add_argument("--data", type=str, default="data/1d")
    p.add_argument("--exp", type=str, default="base_sim")
    p.add_argument("--task", type=str, default="sim", choices=["sim", "control"])
    p.add_argument("--checkpoint", type=str, default="final")
    p.add_argument("--ntest", type=int, default=200)
    p.add_argument("--start", type=int, default=0,
                   help="offset into the test set: evaluate samples "
                        "[start, start+ntest) so a long eval can run (and "
                        "recover) in chunks; raw per-chunk values are saved")
    p.add_argument("--batch_eval", type=int, default=50)
    p.add_argument("--chunk", type=int, default=None,
                   help="write one eval_raw_*.npz per CHUNK samples inside a "
                        "single process (one expensive data load), skipping "
                        "chunks that already exist")
    p.add_argument("--shard_eval", choices=("auto", "on", "off"), default="auto",
                   help="shard sampling over visible devices (auto: when the "
                        "batch divides; off: bit-reproducible single-device)")
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--ddim_eta", type=float, default=1.0)
    p.add_argument("--wu", type=float, default=120000.0)
    p.add_argument("--wf", type=float, default=2e-5)
    p.add_argument("--J_scheduler", type=str, default="cosine")
    p.add_argument("--solver_factor", type=int, default=16,
                   help="re-simulation solver precision (16 = reference GT)")
    p.add_argument("--report_all", action="store_true",
                   help="also report MAE/NMSE/median control metric variants")
    p.add_argument("--super_exp", type=str, default=None,
                   help="super-model exp dir: run the zero-shot SR chain")
    p.add_argument("--super_checkpoint", type=str, default="final")
    p.add_argument("--super_data", type=str, default="data/1d_super/test.npz",
                   help="high-resolution test set for SR ground truth")
    p.add_argument("--upsample", type=int, default=3, help="SR doublings")
    p.set_defaults(fn=cmd_eval_burgers)

    p = _add_common(sub.add_parser("datagen-smoke"))
    p.add_argument("--n", type=int, default=20000)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--split", type=str, default="train")
    p.add_argument("--record_stride", type=int, default=8,
                   help="1 for the 256-frame control test set")
    p.add_argument("--record_res", type=int, default=64,
                   help="128 for the full-resolution simulation test set")
    p.add_argument("--out", type=str, default="data/2d")
    p.add_argument("--start", type=int, default=0,
                   help="global index of the first scene (chunked datagen)")
    p.add_argument("--part", action="store_true",
                   help="write {split}_part{start}.npz for later merging")
    p.set_defaults(fn=cmd_datagen_smoke)

    p = _add_common(sub.add_parser("merge-smoke-data"))
    p.add_argument("--data", type=str, default="data/2d")
    p.add_argument("--split", type=str, default="train")
    p.add_argument("--remove_parts", action="store_true")
    p.set_defaults(fn=cmd_merge_smoke_data)

    p = _add_common(sub.add_parser("prep-smoke"))
    p.add_argument("--data", type=str, default="data/2d")
    p.add_argument("--split", type=str, default="train")
    p.add_argument("--wave_type", type=str, default="bior1.3")
    p.add_argument("--pad_mode", type=str, default="zero")
    p.add_argument("--n_downsample", type=int, default=3)
    p.add_argument("--types", type=str, default="time,space",
                   help="comma-separated downsample families to prep")
    p.add_argument("--levels", type=str, default=None,
                   help="comma-separated absolute downsample exponents to "
                        "prep into a supplemental _lvlA-B npz (reuses an "
                        "existing level-0 blob instead of rewriting it)")
    p.set_defaults(fn=cmd_prep_smoke)

    p = _add_common(sub.add_parser("train-smoke"))
    p.add_argument("--data", type=str, default="data/2d")
    p.add_argument("--exp", type=str, default="base_sim")
    p.add_argument("--wavelet", type=lambda s: s == "True", default=True,
                   help="False: raw (non-wavelet) physical-space states")
    p.add_argument("--wave_type", type=str, default="bior1.3")
    p.add_argument("--pad_mode", type=str, default="zero")
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--dim_mults", type=int, nargs="+", default=[1, 2, 4])
    p.add_argument("--batch", type=int, default=6)
    p.add_argument("--steps", type=int, default=200000)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--timesteps", type=int, default=1000)
    p.add_argument("--condition_control", type=lambda s: s == "True", default=False)
    p.add_argument("--condition_pad", type=lambda s: s == "True", default=True,
                   help="hold padded locations at zero during diffusion "
                        "(reference --is_condition_pad)")
    p.add_argument("--grad_accum", type=int, default=1)
    p.add_argument("--super_model", type=lambda s: s == "True", default=False)
    p.add_argument("--n_downsample", type=int, default=2)
    p.add_argument("--max_train_samples", type=int, default=None,
                   help="cap training scenes (keeps multi-level super states "
                        "inside the device-resident input budget)")
    p.add_argument("--states_only", action="store_true",
                   help="build the states_*.npy training caches then exit "
                        "(run under JAX_PLATFORMS=cpu as a prep stage: the "
                        "build is trivial pad/concat work, and routing its "
                        "33 GB of chunks through the tunneled TPU starved "
                        "the r3 training stage of its whole chip window)")
    p.add_argument("--bf16", type=lambda s: s == "True", default=True)
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--ckpt_every", type=int, default=10000)
    p.add_argument("--resume", action="store_true",
                   help="resume from the newest milestone in results/exp")
    p.add_argument("--overwrite", action="store_true",
                   help="replace an existing experiment id")
    p.add_argument("--host_data", action="store_true",
                   help="force host shard loaders (skip device-resident input)")
    p.add_argument("--model_parallel", type=int, default=1,
                   help="tensor-parallel degree: shard conv/dense kernel "
                        "out-channels over a 'model' mesh axis of this size "
                        "(devices = data x model)")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-3-style fully-sharded state: additionally "
                        "shard kernel in-channels + Adam moments + EMA over "
                        "the 'data' axis (XLA all-gathers weights per layer)")
    p.add_argument("--context_parallel", action="store_true",
                   help="spend the 'model' mesh axis on the batch's "
                        "sequence (frame/time) dimension instead of kernel "
                        "channels (requires --model_parallel > 1)")
    p.add_argument("--trace_dir", type=str, default=None,
                   help="capture a jax.profiler trace of a few steady-state "
                        "train steps into this directory (Perfetto-compatible)")
    p.set_defaults(fn=cmd_train_smoke)

    p = _add_common(sub.add_parser("eval-smoke"))
    p.add_argument("--data", type=str, default="data/2d")
    p.add_argument("--split", type=str, default="test")
    p.add_argument("--exp", type=str, default="base_sim")
    p.add_argument("--task", type=str, default="sim", choices=["sim", "control"])
    p.add_argument("--checkpoint", type=str, default="final")
    p.add_argument("--ntest", type=int, default=50)
    p.add_argument("--batch_eval", type=int, default=10)
    p.add_argument("--shard_eval", choices=("auto", "on", "off"), default="auto",
                   help="shard sampling over visible devices (auto: when the "
                        "batch divides; off: bit-reproducible single-device)")
    p.add_argument("--ddim_steps", type=int, default=100)
    p.add_argument("--ddim_eta", type=float, default=1.0)
    p.add_argument("--standard_fixed_ratio", type=float, default=100.0)
    p.add_argument("--design_guidance", type=str, default="standard",
                   choices=["standard", "standard-alpha"],
                   help="guidance scaling: fixed ratio, or coeff_ratio * "
                        "flip(betas)[t] (reference diffusion_2d.py:736-744)")
    p.add_argument("--coeff_ratio", type=float, default=0.0,
                   help="scale for --design_guidance standard-alpha")
    p.add_argument("--start", type=int, default=0,
                   help="offset into the test set: evaluate samples "
                        "[start, start+ntest) so a long eval can run (and "
                        "recover) in chunks; raw per-chunk values are saved")
    p.add_argument("--w_init", type=float, default=0.1)
    p.add_argument("--w_energy", type=float, default=0.0)
    p.add_argument("--super_exp", type=str, default=None,
                   help="super-model exp dir: run the zero-shot spatial SR chain")
    p.add_argument("--super_checkpoint", type=str, default="final")
    p.add_argument("--upsample", type=int, default=1, help="SR doublings")
    p.set_defaults(fn=cmd_eval_smoke)

    p = _add_common(sub.add_parser("render"))
    p.add_argument("--data", type=str, required=True,
                   help="dataset npz (burgers u/f or smoke Density blob)")
    p.add_argument("--index", type=int, default=0)
    p.add_argument("--out", type=str, default=None)
    p.set_defaults(fn=cmd_render)

    p = _add_common(sub.add_parser("aggregate-eval"))
    p.add_argument("--exp", type=str, required=True)
    p.add_argument("--task", type=str, default="sim")
    p.add_argument("--expect_ntest", type=int, default=None,
                   help="verify the chunks cover exactly [0, N) before writing stats")
    p.set_defaults(fn=cmd_aggregate_eval)

    p = _add_common(sub.add_parser("convert-torch"))
    p.add_argument("--ckpt", type=str, required=True,
                   help="reference torch checkpoint pickle ({step, model, ema, ...})")
    p.add_argument("--arch", choices=("unet2d", "unet3d"), default="unet2d")
    p.add_argument("--exp", type=str, default="converted")
    p.add_argument("--use_ema", type=lambda s: s == "True", default=True)
    p.add_argument("train_args", nargs=argparse.REMAINDER,
                   help="model/config flags forwarded to the matching train "
                        "parser, after a literal '--' separator (e.g. "
                        "-- --dim 128 --dim_mults 1 2 4 8 --condition_f True)")
    p.set_defaults(fn=cmd_convert_torch)

    p = _add_common(sub.add_parser("export-ckpt"))
    p.add_argument("--exp", type=str, required=True)
    p.add_argument("--milestone", type=str, default="latest")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--dtype", type=str, default="float16", choices=["float16", "float32"])
    p.add_argument("--include_opt", action="store_true")
    p.add_argument("--ema_only", action="store_true",
                   help="store only the EMA weights (halves the npz; "
                        "import-ckpt uses EMA for params too)")
    p.set_defaults(fn=cmd_export_ckpt)

    p = _add_common(sub.add_parser("import-ckpt"))
    p.add_argument("--exp", type=str, required=True)
    p.add_argument("--npz", type=str, required=True)
    p.add_argument("--milestone", type=str, default="",
                   help="checkpoint dir suffix; default: the stored step number")
    p.set_defaults(fn=cmd_import_ckpt)

    p = sub.add_parser("doctor")
    p.set_defaults(fn=cmd_doctor)

    return ap


def main(argv=None):
    # WDNO_PLATFORM=cpu forces the CLI onto a given backend.  Env vars alone
    # (JAX_PLATFORMS/JAX_PLATFORM_NAME) are not enough on hosts where a TPU
    # plugin re-exports JAX_PLATFORMS at import time; the config-level
    # setting wins over the plugin.
    if os.environ.get("WDNO_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["WDNO_PLATFORM"])
    # persistent compile cache for every CLI invocation: campaign stages
    # re-enter the same train/eval programs constantly, and a cold compile
    # of the published-config train step costs ~minutes of chip time
    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        import jax

        jax.config.update("jax_compilation_cache_dir", "/tmp/wdno_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # multi-host bootstrap must precede any JAX call that initializes the
    # XLA backend; env-gated no-op on a single host
    from .parallel.distributed import initialize

    initialize()
    args = _build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
