"""End-to-end CLI pipeline test (tiny scales, CPU).

Exercises the L5/L6 surface the reference drives via shell scripts
(``scripts/burgers/*.sh``): datagen -> prep -> train -> eval through
``wdno_tpu.cli.main``, plus the duplicate-experiment-id guard
(reference ``log_exp``, ``train_ddpm_burgers.py:203-217``).
"""

import json
import os

import numpy as np
import pytest

# heavy integration surface: excluded from the fast gate
# (`pytest -m 'not slow'`, ~3 min); the campaign/nightly run covers it
pytestmark = pytest.mark.slow

from wdno_tpu.cli import main


@pytest.fixture(scope="module")
def pipeline_dirs(tmp_path_factory):
    data = str(tmp_path_factory.mktemp("data1d"))
    results = str(tmp_path_factory.mktemp("results"))
    return data, results


def _train_argv(data, results, extra=()):
    return [
        "train-burgers", "--data", data, "--results", results,
        "--exp", "cli_test",
        "--dim", "8", "--dim_mults", "1", "2",
        "--batch", "8", "--steps", "4", "--timesteps", "10",
        "--bf16", "False", "--log_every", "2", "--ckpt_every", "0",
        *extra,
    ]


def test_cli_burgers_pipeline(pipeline_dirs):
    data, results = pipeline_dirs

    # datagen at 2x solver precision (9.6k FD steps; CPU-fast)
    main(["datagen-burgers", "--n_train", "24", "--n_test", "8",
          "--super_factor", "2", "--batch", "32", "--out", data])
    z = np.load(os.path.join(data, "train.npz"))
    assert z["u"].shape == (24, 81, 120) and z["f"].shape == (24, 80, 120)
    assert np.isfinite(z["u"]).all()

    main(["prep-burgers", "--data", data, "--n_downsample", "1"])
    coef = np.load(os.path.join(data, "coef_bior2.4_periodization.npz"))
    assert coef["coef_0"].shape[1:] == (41, 60, 8)

    main(_train_argv(data, results))
    exp = os.path.join(results, "cli_test")
    assert os.path.exists(os.path.join(exp, "config.json"))
    assert os.path.exists(os.path.join(exp, "model-final"))
    metrics = [json.loads(l) for l in open(os.path.join(exp, "metrics.jsonl"))]
    assert metrics and np.isfinite(metrics[-1]["loss"])

    # duplicate-exp-id guard: refuse without --resume/--overwrite
    with pytest.raises(SystemExit):
        main(_train_argv(data, results))
    main(_train_argv(data, results, extra=("--overwrite",)))

    main(["eval-burgers", "--data", data, "--results", results,
          "--exp", "cli_test", "--task", "sim", "--checkpoint", "final",
          "--ntest", "4", "--batch_eval", "4", "--ddim_steps", "5"])
    res = json.load(open(os.path.join(exp, "eval_results.json")))
    mse = res["sim"]["ddpm_mse"]["mean"]
    assert np.isfinite(mse)


def test_cli_eval_chunk_sweep(pipeline_dirs):
    """--chunk sweeps the ntest range in one process, writing one raw file
    per chunk and skipping chunks that already exist (crash recovery without
    re-paying the data load per chunk)."""
    data, results = pipeline_dirs
    exp = os.path.join(results, "cli_test")
    if not os.path.exists(os.path.join(exp, "model-final")):
        main(["datagen-burgers", "--n_train", "24", "--n_test", "8",
              "--super_factor", "2", "--batch", "32", "--out", data])
        main(["prep-burgers", "--data", data, "--n_downsample", "1"])
        main(_train_argv(data, results))
    for f in ("eval_raw_sim_0.npz", "eval_raw_sim_2.npz"):
        p = os.path.join(exp, f)
        if os.path.exists(p):
            os.remove(p)
    # pre-seed chunk 0 with a sentinel: the sweep must SKIP it untouched
    sentinel = os.path.join(exp, "eval_raw_sim_0.npz")
    np.savez(sentinel, ddpm_mse=np.array([123.0, 123.0]))
    main(["eval-burgers", "--data", data, "--results", results,
          "--exp", "cli_test", "--task", "sim", "--checkpoint", "final",
          "--ntest", "4", "--chunk", "2", "--batch_eval", "2",
          "--ddim_steps", "5"])
    kept = np.load(sentinel)
    assert kept["ddpm_mse"].tolist() == [123.0, 123.0], "chunk 0 was redone"
    fresh = np.load(os.path.join(exp, "eval_raw_sim_2.npz"))
    assert fresh["ddpm_mse"].shape == (2,) and np.isfinite(fresh["ddpm_mse"]).all()
    os.remove(sentinel)  # don't poison later aggregate assertions


def test_cli_burgers_tensor_parallel(pipeline_dirs):
    # dp x tp mesh reachable from the CLI (runs on the 8-virtual-device
    # CPU mesh); self-contained when run in isolation
    data, results = pipeline_dirs
    if not os.path.exists(os.path.join(data, "train.npz")):
        main(["datagen-burgers", "--n_train", "24", "--n_test", "8",
              "--super_factor", "2", "--batch", "32", "--out", data])
        main(["prep-burgers", "--data", data, "--n_downsample", "1"])
    main(["train-burgers", "--data", data, "--results", results,
          "--exp", "cli_tp", "--dim", "8", "--dim_mults", "1", "2",
          "--batch", "8", "--steps", "2", "--timesteps", "10",
          "--bf16", "False", "--log_every", "1", "--ckpt_every", "2",
          "--model_parallel", "2"])
    metrics = [json.loads(l) for l in
               open(os.path.join(results, "cli_tp", "metrics.jsonl"))]
    assert metrics and np.isfinite(metrics[-1]["loss"])

    # checkpoint resume restores sharded state (orbax round-trip through
    # host + jit resharding) and respects the total step budget
    main(["train-burgers", "--data", data, "--results", results,
          "--exp", "cli_tp", "--dim", "8", "--dim_mults", "1", "2",
          "--batch", "8", "--steps", "4", "--timesteps", "10",
          "--bf16", "False", "--log_every", "1", "--ckpt_every", "0",
          "--model_parallel", "2", "--resume"])
    metrics = [json.loads(l) for l in
               open(os.path.join(results, "cli_tp", "metrics.jsonl"))]
    assert metrics[-1]["step"] == 4 and np.isfinite(metrics[-1]["loss"])


def test_cli_burgers_super_pipeline(pipeline_dirs):
    """Super-resolution path through the CLI: multi-level super training
    (MultiResolutionLoader) + zero-shot SR chain eval against high-res GT."""
    data, results = pipeline_dirs
    if not os.path.exists(os.path.join(data, "train.npz")):
        main(["datagen-burgers", "--n_train", "24", "--n_test", "8",
              "--super_factor", "2", "--batch", "32", "--out", data])
        main(["prep-burgers", "--data", data, "--n_downsample", "1"])
    # needs >= 2 coef levels for the super model
    main(["prep-burgers", "--data", data, "--n_downsample", "2"])
    # high-res test set for SR ground truth (one doubling: 161x240)
    hi = os.path.join(data, "hi")
    main(["datagen-burgers", "--n_train", "0", "--n_test", "8",
          "--nt", "160", "--nx", "240", "--super_factor", "2",
          "--batch", "8", "--out", hi])
    # base model must exist for the chain's level-0 sample
    if not os.path.exists(os.path.join(results, "cli_test", "model-final")):
        main(_train_argv(data, results))
    # prep has 2 levels -> super trains on 1 level (needs level+1 low-res
    # conditioning; reference preps 4 downsamplings for --N_downsample 3)
    main(["train-burgers", "--data", data, "--results", results,
          "--exp", "cli_super", "--super_model", "True", "--n_downsample", "1",
          "--dim", "8", "--dim_mults", "1", "2",
          "--batch", "8", "--steps", "4", "--timesteps", "10",
          "--bf16", "False", "--log_every", "2", "--ckpt_every", "0"])
    main(["eval-burgers", "--data", data, "--results", results,
          "--exp", "cli_test", "--task", "sim", "--checkpoint", "final",
          "--super_exp", "cli_super", "--super_data",
          os.path.join(hi, "test.npz"), "--upsample", "1",
          "--ntest", "4", "--batch_eval", "4", "--ddim_steps", "5"])
    res = json.load(open(os.path.join(results, "cli_test", "eval_results.json")))
    # runs with the SR chain attached are keyed/tagged "sim_sr" so their
    # chunks never collide with base-only "sim" chunks of the same exp
    assert np.isfinite(res["sim_sr"]["ddpm_mse_up1"]["mean"])
    assert os.path.exists(
        os.path.join(results, "cli_test", "eval_raw_sim_sr_0.npz")
    )


def test_cli_burgers_control_eval(pipeline_dirs):
    """Control task through the CLI: guided sampling + solver-in-the-loop
    re-simulation (reduced solver precision keeps the CPU FD solve cheap)."""
    data, results = pipeline_dirs
    if not os.path.exists(os.path.join(data, "train.npz")):
        main(["datagen-burgers", "--n_train", "24", "--n_test", "8",
              "--super_factor", "2", "--batch", "32", "--out", data])
        main(["prep-burgers", "--data", data, "--n_downsample", "1"])
    if not os.path.exists(os.path.join(results, "cli_test", "model-final")):
        main(_train_argv(data, results))
    main(["eval-burgers", "--data", data, "--results", results,
          "--exp", "cli_test", "--task", "control", "--checkpoint", "final",
          "--ntest", "4", "--batch_eval", "4", "--ddim_steps", "5",
          "--solver_factor", "2", "--report_all"])
    res = json.load(open(os.path.join(results, "cli_test", "eval_results.json")))
    for k in ("J_actual", "control_energy", "total_J"):
        assert np.isfinite(res["control"][k]["mean"])


def test_cli_burgers_raw_pipeline(pipeline_dirs):
    """Raw (non-wavelet) mode end to end: --wavelet False train + eval."""
    data, results = pipeline_dirs
    if not os.path.exists(os.path.join(data, "train.npz")):
        main(["datagen-burgers", "--n_train", "24", "--n_test", "8",
              "--super_factor", "2", "--batch", "32", "--out", data])
    main(["train-burgers", "--data", data, "--results", results,
          "--exp", "cli_raw", "--wavelet", "False",
          "--dim", "8", "--dim_mults", "1", "2",
          "--batch", "8", "--steps", "2", "--timesteps", "10",
          "--bf16", "False", "--log_every", "1", "--ckpt_every", "0"])
    main(["eval-burgers", "--data", data, "--results", results,
          "--exp", "cli_raw", "--task", "sim", "--checkpoint", "final",
          "--ntest", "4", "--batch_eval", "4", "--ddim_steps", "5"])
    res = json.load(open(os.path.join(results, "cli_raw", "eval_results.json")))
    assert np.isfinite(res["sim"]["ddpm_mse"]["mean"])


def test_cli_smoke_raw_pipeline(tmp_path):
    """Raw (non-wavelet) smoke mode through the CLI: --wavelet False train +
    sim eval on synthetic fields (real datagen is chip-speed territory).
    Shapes are reduced (9 frames @ 16^2 vs the reference's 32 @ 64^2) to keep
    the CPU compile cheap; both CLI paths derive shapes from the data."""
    data = str(tmp_path / "data2d")
    results = str(tmp_path / "results")
    os.makedirs(data)
    rng = np.random.default_rng(0)
    N, F, X = 8, 9, 16
    fields = {
        "Density": rng.random((N, F, X, X)).astype(np.float32),
        "Velocity": rng.standard_normal((N, F, X, X, 2)).astype(np.float32),
        "Control": rng.standard_normal((N, F, X, X, 2)).astype(np.float32),
        "Smoke": rng.random((N, F, 7)).astype(np.float32) + 0.1,
    }
    np.savez(os.path.join(data, "train.npz"), **fields)
    np.savez(os.path.join(data, "test.npz"), **fields)

    main(["train-smoke", "--data", data, "--results", results,
          "--exp", "raw", "--wavelet", "False", "--dim", "8",
          "--dim_mults", "1", "2", "--batch", "8", "--steps", "2",
          "--timesteps", "8", "--bf16", "False", "--log_every", "1",
          "--ckpt_every", "0"])
    main(["eval-smoke", "--data", data, "--results", results,
          "--exp", "raw", "--task", "sim", "--split", "test",
          "--ntest", "2", "--batch_eval", "2", "--ddim_steps", "3"])
    res = json.load(open(os.path.join(results, "raw", "eval_results.json")))
    assert np.isfinite(res["sim"]["mse"]["mean"])


def test_cli_aggregate_eval(tmp_path):
    """aggregate-eval combines chunked eval_raw_*.npz into exact whole-run
    statistics (chunking is our crash-recovery addition to the reference's
    single-process eval, ``eval_ddpm_burgers.py:378-428``)."""
    outdir = tmp_path / "results" / "agg_test"
    outdir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    a = rng.normal(size=100)
    b = rng.normal(size=60)
    np.savez(outdir / "eval_raw_sim_0.npz", ddpm_mse=a)
    np.savez(outdir / "eval_raw_sim_100.npz", ddpm_mse=b)
    main(["aggregate-eval", "--results", str(tmp_path / "results"),
          "--exp", "agg_test", "--task", "sim"])
    res = json.load(open(outdir / "eval_results.json"))
    full = np.concatenate([a, b])
    assert res["sim"]["ddpm_mse"]["mean"] == pytest.approx(full.mean())
    assert res["sim"]["ddpm_mse"]["std"] == pytest.approx(full.std())
    assert res["sim"]["ddpm_mse"]["median"] == pytest.approx(np.median(full))


def test_cli_aggregate_eval_dedup_and_coverage(tmp_path):
    """Two producers (TPU 1000-blocks ascending, CPU 50-chunks descending)
    can race and overlap; the aggregator must dedup exactly (sample i of a
    chunk at start S is global sample S+i), ignore empty reservation
    placeholders, and with --expect_ntest fail loudly on gaps."""
    outdir = tmp_path / "results" / "agg_test"
    outdir.mkdir(parents=True)
    truth = np.arange(200, dtype=np.float64) ** 1.5  # distinct per sample
    # block chunk [0,150) and an overlapping CPU chunk [100,150)
    np.savez(outdir / "eval_raw_sim_0.npz", ddpm_mse=truth[0:150])
    np.savez(outdir / "eval_raw_sim_100.npz", ddpm_mse=truth[100:150])
    np.savez(outdir / "eval_raw_sim_150.npz", ddpm_mse=truth[150:200])
    np.savez(outdir / "eval_raw_sim_1000.npz")  # empty placeholder
    main(["aggregate-eval", "--results", str(tmp_path / "results"),
          "--exp", "agg_test", "--task", "sim", "--expect_ntest", "200"])
    res = json.load(open(outdir / "eval_results.json"))
    assert res["sim"]["ddpm_mse"]["mean"] == pytest.approx(truth.mean())
    assert res["sim"]["ddpm_mse"]["std"] == pytest.approx(truth.std())
    # a gap must abort before writing stats
    (outdir / "eval_raw_sim_150.npz").unlink()
    (outdir / "eval_results.json").unlink()
    with pytest.raises(SystemExit, match="incomplete"):
        main(["aggregate-eval", "--results", str(tmp_path / "results"),
              "--exp", "agg_test", "--task", "sim", "--expect_ntest", "200"])
    assert not (outdir / "eval_results.json").exists()


def test_load_coef_db_probe(tmp_path):
    """probe=True must reproduce the full load's shapes/dtypes from npy
    headers alone (eval uses the coef db only as a shape probe)."""
    from wdno_tpu.cli import _load_coef_db

    path = str(tmp_path / "coef.npz")
    rng = np.random.default_rng(0)
    np.savez(
        path,
        n_levels=2,
        coef_0=rng.normal(size=(5, 41, 60, 8)).astype(np.float32),
        coef_1=rng.normal(size=(5, 21, 30, 8)).astype(np.float32),
        shape=np.array([[41, 60], [21, 30]]),
        ori_shape=np.array([[81, 120], [41, 60]]),
    )
    full = _load_coef_db(path)
    prob = _load_coef_db(path, probe=True)
    assert full["shape"] == prob["shape"]
    assert full["ori_shape"] == prob["ori_shape"]
    for a, b in zip(full["coef"], prob["coef"]):
        assert b.shape == (1,) + a.shape[1:]
        assert b.dtype == a.dtype


def test_cli_datagen_smoke_parts_merge(tmp_path, monkeypatch):
    """Chunked --part datagen + merge-smoke-data reproduces single-shot
    datagen (scene identity = (seed, global index); rollouts match only
    approximately across batch splits because CG reduction order differs)."""
    import wdno_tpu.data.smoke_data as sd

    monkeypatch.setattr(sd, "SCENE_LEN", 8)
    out = str(tmp_path)
    common = ["--record_stride", "2", "--batch", "2", "--out", out,
              "--split", "train"]
    main(["datagen-smoke", "--n", "4"] + common)
    with np.load(os.path.join(out, "train.npz")) as z:
        whole = {k: z[k].copy() for k in z.files}
    main(["datagen-smoke", "--n", "2", "--start", "0", "--part"] + common)
    main(["datagen-smoke", "--n", "2", "--start", "2", "--part"] + common)
    main(["merge-smoke-data", "--data", out, "--split", "train",
          "--remove_parts"])
    assert not os.path.exists(os.path.join(out, "train_part0.npz"))
    with np.load(os.path.join(out, "train.npz")) as z:
        np.testing.assert_array_equal(whole["Density"][:, 0], z["Density"][:, 0])
        for k in whole:
            assert z[k].shape == whole[k].shape
            np.testing.assert_allclose(whole[k], z[k], atol=0.15)


def test_cli_export_import_ckpt_roundtrip(tmp_path):
    """export-ckpt -> import-ckpt reproduces params/EMA/step closely enough
    to evaluate (f16 quantization bounds the error), giving trained models a
    git-committable form that survives the disposable results/ directory."""
    import orbax.checkpoint as ocp

    data, results = str(tmp_path / "d"), str(tmp_path / "r")
    main(["datagen-burgers", "--n_train", "16", "--n_test", "4",
          "--super_factor", "2", "--batch", "16", "--out", data])
    main(["prep-burgers", "--data", data, "--n_downsample", "1"])
    main(["train-burgers", "--data", data, "--results", results,
          "--exp", "src", "--dim", "8", "--dim_mults", "1", "2",
          "--batch", "8", "--steps", "4", "--timesteps", "10",
          "--bf16", "False", "--log_every", "2", "--ckpt_every", "2"])

    npz = str(tmp_path / "src.npz")
    main(["export-ckpt", "--results", results, "--exp", "src", "--out", npz])
    main(["import-ckpt", "--results", results, "--exp", "dst", "--npz", npz])

    ck = ocp.StandardCheckpointer()
    src = ck.restore(os.path.join(os.path.abspath(results), "src", "model-4"))
    dst = ck.restore(os.path.join(os.path.abspath(results), "dst", "model-4"))
    assert int(src["step"]) == int(dst["step"]) == 4
    assert json.load(open(os.path.join(results, "dst", "config.json")))["dim"] == 8

    import jax

    def flat(tree):
        return {
            "/".join(str(getattr(k, "key", k)) for k in kp): v
            for kp, v in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    for name in ("params", "ema_params"):
        fs, fd = flat(src[name]), flat(dst[name])
        assert fs.keys() == fd.keys()
        for k in fs:
            np.testing.assert_allclose(
                np.asarray(fs[k], np.float32), np.asarray(fd[k], np.float32),
                rtol=2e-3, atol=2e-3, err_msg=f"{name}:{k}")


@pytest.mark.slow
def test_cli_smoke_super_pipeline_with_supplemental_levels(tmp_path):
    """Smoke SUPER training through the CLI with the r4 two-file coef
    layout: the standard npz holds level 0 only (as on the reference-budget
    host, where level 0 is 33 GB) and a supplemental `_lvl1-2` npz from
    `prep-smoke --levels 1,2` provides the downsampled levels.  Trains the
    82-channel model for 2 steps over levels 0..1 (each conditioned on the
    next level up) at the real [24,40,40] state geometry."""
    data = str(tmp_path / "data2d")
    results = str(tmp_path / "results")
    os.makedirs(data)
    rng = np.random.default_rng(0)
    N, F, X = 4, 33, 64
    fields = {
        "Density": rng.random((N, F, X, X)).astype(np.float32),
        "Velocity": rng.standard_normal((N, F, X, X, 2)).astype(np.float32),
        "Control": rng.standard_normal((N, F, X, X, 2)).astype(np.float32),
        "Smoke": rng.random((N, F, 8)).astype(np.float32) + 0.1,
    }
    np.savez(os.path.join(data, "train.npz"), **fields)

    main(["prep-smoke", "--data", data, "--types", "space",
          "--n_downsample", "1"])
    main(["prep-smoke", "--data", data, "--types", "space",
          "--levels", "1,2"])
    assert os.path.exists(
        os.path.join(data, "coef_bior1.3_zero_space_lvl1-2_train.npz"))

    common = ["--data", data, "--results", results,
              "--super_model", "True", "--condition_control", "True",
              "--n_downsample", "2", "--dim", "8", "--dim_mults", "1", "2",
              "--batch", "8", "--steps", "2", "--timesteps", "8",
              "--bf16", "False", "--log_every", "1", "--ckpt_every", "0"]
    # default path: STREAMING aligned-slab reservoirs (no states caches)
    main(["train-smoke", "--exp", "cli_smoke_super_stream"] + common)
    m = [json.loads(l) for l in
         open(os.path.join(results, "cli_smoke_super_stream", "metrics.jsonl"))]
    assert m and np.isfinite(m[-1]["loss"])
    for lvl in (0, 1):
        assert not os.path.exists(os.path.join(
            data, f"states_bior1.3_zero_space_super_lvl{lvl}.npy"))

    # --host_data: materialized per-level states caches (the r4 campaign
    # fallback)
    main(["train-smoke", "--exp", "cli_smoke_super", "--host_data"] + common)
    m = [json.loads(l) for l in
         open(os.path.join(results, "cli_smoke_super", "metrics.jsonl"))]
    assert m and np.isfinite(m[-1]["loss"])
    for lvl in (0, 1):
        assert os.path.exists(os.path.join(
            data, f"states_bior1.3_zero_space_super_lvl{lvl}.npy"))


def test_sim_eval_frames_stride_handling():
    """Sim-task frame selection: a stride-1 recorded split (257 frames, the
    control re-simulation protocol) must be subsampled to the training
    record stride 8 — the first 32 raw frames are a different temporal
    window than the stride-8 frames the model trained on; an
    already-strided 33-frame split passes through unchanged."""
    from wdno_tpu.cli import _sim_eval_frames

    frames = np.arange(257)
    raw = np.broadcast_to(frames[None, :, None, None, None],
                          (2, 257, 6, 8, 8))
    out = np.asarray(_sim_eval_frames(raw, 32))
    assert out.shape == (2, 32, 6, 8, 8)
    np.testing.assert_array_equal(out[0, :, 0, 0, 0], np.arange(0, 256, 8))

    strided = raw[:, ::8]  # 33 frames, as datagen --record_stride 8 writes
    out2 = np.asarray(_sim_eval_frames(strided, 32))
    np.testing.assert_array_equal(out2, out)
