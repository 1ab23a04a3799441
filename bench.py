"""Benchmark: flagship denoiser training-step throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The metric is denoise train steps/sec/chip for the smoke base model at the
published configuration (UNet3D dim=64, mults (1,2,4), 42 channels,
state [24, 40, 40], batch 6, full loss+grad+Adam+EMA step — reference
trains this on 2x GPU DDP with per-device batch 3,
``scripts/smoke/train_base_sim.sh``).

``vs_baseline``: the reference repo publishes no numbers (BASELINE.md), so
the baseline is an analytic A100 estimate derived from the measured model
FLOPs: step_time_A100 = 3 * fwd_flops / (312 TFLOP/s * 0.35 MFU) — i.e.
an optimistic torch A100 at 35% MFU.  vs_baseline = est_A100_time /
measured_time (>1 means faster than the A100 estimate).
"""

import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp

# persistent compile cache: the fused train step takes minutes to compile cold
jax.config.update("jax_compilation_cache_dir", "/tmp/wdno_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "results", "bench_last.json")


def _print_cached(flag):
    """Print the most recent real-chip measurement, flagged so it can't be
    mistaken for a fresh number.  Returns True if a cached record existed."""
    try:
        rec = json.load(open(_CACHE))
    except (OSError, ValueError):
        return False
    rec["metric"] += flag
    print(json.dumps(rec), flush=True)
    return True


def _wait_for_device(max_wait_s=None, poll_s=30):
    """Block until the TPU answers a cheap probe, up to a deadline.

    The tunnel to the chip can be transiently down (for hours at a time);
    probing in a fresh subprocess avoids initializing (and error-caching)
    the backend in this process before the device is actually reachable.

    Driver-robustness contract (round-2 postmortem: BENCH_r02 rc=124 with
    parsed=null): the FIRST failed probe immediately prints the cached
    last-real-measurement JSON line, so even if the driver's timeout
    pre-empts the rest of the wait, a parseable flagged number is already on
    stdout.  If the device then comes back before the (short) deadline, a
    fresh measurement is printed as a second JSON line which supersedes it.
    """
    max_wait_s = max_wait_s or float(os.environ.get("WDNO_BENCH_WAIT_S", 240))
    deadline = time.time() + max_wait_s
    cached_printed = False
    while True:
        # No pipes and an intermediate `timeout -s KILL`: with the tunnel
        # dead the probe python can wedge in UNINTERRUPTIBLE (D-state) vsock
        # I/O — it then can't be killed OR reaped, so a plain subprocess.run
        # blocks forever in its post-kill wait()/pipe-drain and bench never
        # reaches its own deadline (observed live at r3 close).  Killing the
        # `timeout` wrapper always succeeds; a D-state grandchild is simply
        # orphaned.
        probe = subprocess.Popen(
            ["timeout", "-s", "KILL", "80",
             sys.executable, "-c", "import jax; jax.devices()[0]"],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            start_new_session=True,
        )
        try:
            if probe.wait(timeout=90) == 0:
                return True
        except subprocess.TimeoutExpired:
            probe.kill()
            try:
                probe.wait(timeout=5)
            except subprocess.TimeoutExpired:
                pass
        if not cached_printed:
            cached_printed = _print_cached("_cached_chip_unreachable")
        if time.time() > deadline:
            print(
                "bench: device unreachable after "
                f"{max_wait_s:.0f}s of probing — infra outage, not a perf result",
                file=sys.stderr,
            )
            sys.exit(0 if cached_printed else 1)
        print("bench: device unavailable, retrying...", file=sys.stderr)
        time.sleep(poll_s)


_CAMPAIGN_PIDFILES = (
    "/tmp/campaign_*.pid",  # glob: every campaign stage records one of these
    "/tmp/eval_chunks.pid", "/tmp/eval_cpu.pid", "/tmp/eval_cpu_desc.pid",
    "/tmp/stage2b.pid", "/tmp/stage3b.pid", "/tmp/stage_h_runner.pid",
)


# process groups currently SIGSTOPped by a live _PauseCampaign — consulted
# by handlers that hard-exit (os._exit skips __exit__, and a paused trainer
# left stopped would freeze the whole campaign queue)
_PAUSED_PGIDS = []


def _resume_paused():
    import signal

    for pgid in list(_PAUSED_PGIDS):
        try:
            os.killpg(pgid, signal.SIGCONT)
        except (ProcessLookupError, PermissionError):
            pass


class _PauseCampaign:
    """SIGSTOP the long-running campaign process groups for the duration of
    the measurement (SIGCONT on exit, even on crash).

    The campaign stages (training/eval loops launched via setsid, pids
    recorded in /tmp/*.pid) share the single TPU chip; an unpaused training
    loop interleaves its steps with the bench's and roughly doubles the
    measured step time.  Suspension uses only recorded pid files — no
    process-name matching — and an in-flight device program simply finishes
    before the pause takes effect.
    """

    def __init__(self):
        import glob

        files = os.environ.get("WDNO_BENCH_PAUSE_PIDFILES")
        pats = [files] if files else list(_CAMPAIGN_PIDFILES)
        self.pidfiles = sorted({p for pat in pats for p in glob.glob(pat)})
        self.pgids = []

    def __enter__(self):
        import signal

        # a `timeout`-delivered SIGTERM must unwind this context manager —
        # the default handler exits WITHOUT running __exit__, which would
        # leave the campaign process groups SIGSTOPped forever
        self._prev_sigterm = signal.signal(
            signal.SIGTERM, lambda *_: (_ for _ in ()).throw(SystemExit(143))
        )

        own = os.getpgrp()
        for f in self.pidfiles:
            try:
                pid = int(open(f).read().strip())
                pgid = os.getpgid(pid)
            except (OSError, ValueError, ProcessLookupError):
                continue
            if pgid in (own, 0) or pgid in self.pgids:
                continue
            try:
                os.killpg(pgid, signal.SIGSTOP)
                self.pgids.append(pgid)
                _PAUSED_PGIDS.append(pgid)
            except (ProcessLookupError, PermissionError):
                pass
        if self.pgids:
            print(f"bench: paused campaign groups {self.pgids}", file=sys.stderr)
        return self

    def __exit__(self, *exc):
        import signal

        for pgid in self.pgids:
            try:
                os.killpg(pgid, signal.SIGCONT)
            except (ProcessLookupError, PermissionError):
                pass
            if pgid in _PAUSED_PGIDS:
                _PAUSED_PGIDS.remove(pgid)
        signal.signal(signal.SIGTERM, self._prev_sigterm)
        if self.pgids:
            print(f"bench: resumed campaign groups {self.pgids}", file=sys.stderr)
        return False


def main():
    import signal

    # A driver-side `timeout` sends SIGTERM; never die silently — flush the
    # cached record first so the round always has a parseable number.
    def _on_term(*_):
        _resume_paused()
        # rc=0 only when a parseable record actually went out; a silent
        # success would mask the exact parsed=null outcome this exists for
        os._exit(0 if _print_cached("_cached_interrupted") else 1)

    signal.signal(signal.SIGTERM, _on_term)
    _wait_for_device()

    # Self-deadline: a half-alive tunnel can pass the devices() probe yet
    # wedge the first real device program indefinitely (observed at r3
    # close after a client died mid-transfer).  The driver's own timeout
    # then yields rc=124 with no fresh line — so bail out from inside,
    # flushing the cached record, well before any plausible driver budget.
    def _on_alarm(*_):
        print("bench: self-deadline hit mid-measure (wedged chip or cold-"
              "compile overrun) — emitting cached record", file=sys.stderr)
        _resume_paused()
        os._exit(0 if _print_cached("_cached_measure_deadline") else 1)

    signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(int(os.environ.get("WDNO_BENCH_SELFKILL_S", "420")))
    try:
        _measure()
        signal.alarm(0)
    except SystemExit as e:
        # SystemExit(143) = SIGTERM delivered inside _PauseCampaign (whose
        # handler must raise so the paused campaign gets SIGCONTed on unwind)
        if e.code == 143:
            os._exit(0 if _print_cached("_cached_interrupted") else 1)
        raise
    except BaseException as e:
        print(f"bench: measurement failed: {e!r}", file=sys.stderr)
        if not _print_cached("_cached_measure_failed"):
            raise


def _measure():
    from wdno_tpu.core.conditioning import smoke_spec
    from wdno_tpu.core.diffusion import GaussianDiffusion
    from wdno_tpu.core.schedules import make_schedule
    from wdno_tpu.data.rescalers import smoke_wavelet_rescaler
    from wdno_tpu.models.unet3d import UNet3D
    from wdno_tpu.train.state import TrainConfig, create_train_state
    from wdno_tpu.train.trainer import make_train_step

    B, F, H, Wd, C = 6, 24, 40, 40, 42
    state_shape = (F, H, Wd, C)
    model = UNet3D(dim=64, dim_mults=(1, 2, 4), channels=C, dtype=jnp.bfloat16)

    x = jnp.zeros((B,) + state_shape, jnp.float32)
    t = jnp.zeros((B,), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t)

    spec = smoke_spec(state_shape, (18, 34, 34), is_condition_control=True)
    sched = make_schedule("sigmoid", 1000)
    gd = GaussianDiffusion(
        model.apply,
        sched,
        state_shape=state_shape,
        spec=spec,
        loss_channel_weight=smoke_wavelet_rescaler("bior1.3"),
    )
    cfg = TrainConfig(
        learning_rate=1e-3,
        lr_schedule="multistep",
        flat_opt=bool(int(os.environ.get("WDNO_FLAT_OPT", "0"))),
    )
    tstate = create_train_state(params, cfg)
    step = jax.jit(make_train_step(gd, cfg), donate_argnums=(0,))

    rng = jax.random.PRNGKey(0)
    batch = jax.random.normal(jax.random.PRNGKey(1), (B,) + state_shape, jnp.float32)

    # fwd FLOPs for the A100 baseline estimate
    fwd = jax.jit(model.apply)
    try:
        cost = fwd.lower(params, x, t).compile().cost_analysis()
        fwd_flops = float(cost.get("flops", 0.0))
    except Exception:
        fwd_flops = 0.0

    # presplit rngs: eager per-iteration random.split dispatches tiny ops
    # that dominate wall-clock on remote/tunneled backends and would make
    # this measure dispatch latency instead of step compute
    iters = 30
    rngs = list(jax.random.split(rng, iters + 2))  # materialize outside the loop
    jax.block_until_ready(rngs)

    # compile + warmup OUTSIDE the campaign pause: a cold compile of this
    # step takes up to ~25 min server-side, and stealing that much chip time
    # from a paused training campaign (a) wastes the campaign and (b) once
    # left a watchdog killing the paused trainer on resume
    tstate, m = step(tstate, batch, rngs[0])
    float(m["loss"])  # device fetch: the tunneled backend's
    # block_until_ready can return before the program finishes (observed
    # 283 "steps"/s = 778% MFU); a host transfer of the result is the only
    # reliable barrier here.

    with _PauseCampaign():
        # one more warm step so the first timed step isn't interleaved with
        # the campaign's last in-flight program
        tstate, m = step(tstate, batch, rngs[iters + 1])
        float(m["loss"])
        t0 = time.time()
        for i in range(iters):
            tstate, m = step(tstate, batch, rngs[i + 1])
        float(m["loss"])
        dt = (time.time() - t0) / iters

    steps_per_sec = 1.0 / dt
    # chip peak for the honest MFU number: TPU v5e (v5 lite) = 197 TFLOP/s
    # bf16; override for other chips via env.
    chip_peak = float(os.environ.get("WDNO_CHIP_PEAK_TFLOPS", 197)) * 1e12
    if fwd_flops > 0:
        train_flops = 3.0 * fwd_flops  # fwd + bwd (2x fwd)
        a100_step = train_flops / (312e12 * 0.35)
        vs_baseline = a100_step / dt
        tflops = train_flops / dt / 1e12
        mfu = train_flops / dt / chip_peak
    else:
        vs_baseline = tflops = mfu = 0.0

    rec = {
        "metric": "smoke_base_train_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 4),
        "unit": "steps/s",
        "vs_baseline": round(vs_baseline, 4),
        "tflops": round(tflops, 2),
        "mfu": round(mfu, 4),
    }
    try:
        os.makedirs(os.path.dirname(_CACHE), exist_ok=True)
        tmp = _CACHE + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, _CACHE)
    except OSError:
        pass
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
