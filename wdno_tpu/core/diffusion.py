"""Gaussian diffusion engine: q/p math, DDPM + DDIM samplers, guidance.

Functional JAX redesign of the reference's two GaussianDiffusion modules
(``burgers/ddpm_burgers/diffusion_1d.py:40-654`` and
``smoke/ddpm/diffusion_2d.py:568-1058``), unified:

* states are channels-last tensors ``[B, *spatial, C]``;
* hard conditioning is a static :class:`ConditionSpec` applied as one fused
  ``where`` per step instead of scattered index writes;
* both samplers are single ``lax.scan`` programs — compiled once, no Python
  loop over timesteps;
* guidance is a differentiable closure whose ``jax.grad`` is traced into the
  same scan (the reference re-enters autograd every step,
  ``diffusion_1d.py:221-224``, ``inference_2d.py:30-66``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .conditioning import ConditionSpec
from .schedules import DiffusionSchedule

__all__ = ["GuidanceConfig", "GaussianDiffusion", "ModelPrediction", "proj_ep_orthogonal"]

Array = jnp.ndarray
ModelApply = Callable[[Any, Array, Array], Array]  # (params, x, t) -> pred


class ModelPrediction(NamedTuple):
    pred_noise: Array
    pred_x_start: Array


def _extract(a: Array, t: Array, ndim: int) -> Array:
    """a[t] broadcast against a rank-``ndim`` batch tensor."""
    return a[t].reshape(t.shape + (1,) * (ndim - 1))


def proj_ep_orthogonal(ep: Array, nabla_J: Array) -> Array:
    """Project guidance onto the component orthogonal-ish to eps (F-norm
    variant, reference ``model_utils.py:75-77``).

    Deliberate bug-for-bug parity: the reference's inner product is a
    single ``.sum()`` over ALL axes (batch included) while its norm is
    per-(sample, channel) over the spatial axes only, so one sample's
    projection depends on its batch-mates and the two reductions use
    different inner products.  Kept as-is so guided results are comparable;
    a mathematically clean per-sample projection would use matching axes.
    """
    assert ep.ndim >= 3, f"expected [B, *spatial, C] state, got ndim={ep.ndim}"
    spatial_axes = tuple(range(1, ep.ndim - 1))  # all but batch and channel
    inner = jnp.sum(nabla_J * ep)
    norm = jnp.sqrt(jnp.sum(ep**2, axis=spatial_axes, keepdims=True))
    return ep + nabla_J - inner * ep / norm


@dataclasses.dataclass(frozen=True)
class GuidanceConfig:
    """Gradient guidance injected into the predicted noise.

    ``grad_fn(x_start) -> dJ/dx`` is added to eps-hat with a per-timestep
    weight: ``weight * schedule[t]``.  Covers both reference schemes:

    * Burgers: ``nablaJ(x0) * J_scheduler(t)`` (``diffusion_1d.py:221-224``)
      -> pass the J-scheduler table as ``schedule``;
    * smoke 'standard': fixed ratio (``diffusion_2d.py:739-740``) -> scalar
      ``weight`` only; 'standard-alpha': ``coeff_ratio * flip(betas)[t]``
      (``:741-744``) -> pass ``schedule=flip(betas)``.
    """

    grad_fn: Callable[[Array], Array]
    weight: float = 1.0
    schedule: Optional[np.ndarray] = None  # [T] table indexed by t
    proj: Optional[Callable[[Array, Array], Array]] = None  # (eps, g) -> eps'

    def step_weight(self, t: Array) -> Array:
        w = jnp.asarray(self.weight, jnp.float32)
        if self.schedule is not None:
            w = w * jnp.asarray(self.schedule)[t]
        return jnp.broadcast_to(w, t.shape)


class GaussianDiffusion:
    def __init__(
        self,
        model_apply: ModelApply,
        schedule: DiffusionSchedule,
        *,
        state_shape: tuple,
        objective: str = "pred_noise",
        spec: Optional[ConditionSpec] = None,
        loss_channel_weight: Optional[np.ndarray] = None,
        sampling_timesteps: Optional[int] = None,
        ddim_eta: float = 0.0,
        clip_denoised: bool = True,
    ):
        """
        Args:
          model_apply: ``(params, x, t) -> prediction`` (channels-last).
          state_shape: per-sample state shape, e.g. ``(64, 64, 9)``.
          spec: hard-conditioning masks; ``None`` disables conditioning.
          loss_channel_weight: per-channel loss weight (the reference
            multiplies the elementwise MSE by the RESCALER table,
            ``diffusion_1d.py:640-641``); shape broadcastable to the state.
        """
        assert objective in ("pred_noise", "pred_x0", "pred_v")
        self.model_apply = model_apply
        self.sched = schedule
        self.state_shape = tuple(state_shape)
        self.objective = objective
        self.spec = spec
        self.loss_channel_weight = (
            None if loss_channel_weight is None else np.asarray(loss_channel_weight, np.float32)
        )
        self.num_timesteps = schedule.num_timesteps
        self.sampling_timesteps = sampling_timesteps or self.num_timesteps
        assert self.sampling_timesteps <= self.num_timesteps
        self.is_ddim_sampling = self.sampling_timesteps < self.num_timesteps
        self.ddim_eta = ddim_eta
        self.clip_denoised = clip_denoised

    def with_shape(self, state_shape: tuple, spec: Optional[ConditionSpec]) -> "GaussianDiffusion":
        """Copy bound to a different state shape + conditioning spec.

        The denoisers are fully convolutional, so one set of params serves
        every resolution level of the zero-shot super-resolution chain
        (reference re-instantiates nothing either — it just feeds larger
        tensors, ``eval_ddpm_burgers.py:307-338``, ``inference_2d.py:155-232``);
        only the static sampling shape and masks change.
        """
        import copy

        other = copy.copy(self)
        other.state_shape = tuple(state_shape)
        other.spec = spec
        return other

    # ------------------------------------------------------------------ math

    def predict_start_from_noise(self, x_t, t, noise):
        s = self.sched
        nd = x_t.ndim
        return (
            _extract(s.sqrt_recip_alphas_cumprod, t, nd) * x_t
            - _extract(s.sqrt_recipm1_alphas_cumprod, t, nd) * noise
        )

    def predict_noise_from_start(self, x_t, t, x0):
        s = self.sched
        nd = x_t.ndim
        return (_extract(s.sqrt_recip_alphas_cumprod, t, nd) * x_t - x0) / _extract(
            s.sqrt_recipm1_alphas_cumprod, t, nd
        )

    def predict_v(self, x_start, t, noise):
        s = self.sched
        nd = x_start.ndim
        return (
            _extract(s.sqrt_alphas_cumprod, t, nd) * noise
            - _extract(s.sqrt_one_minus_alphas_cumprod, t, nd) * x_start
        )

    def predict_start_from_v(self, x_t, t, v):
        s = self.sched
        nd = x_t.ndim
        return (
            _extract(s.sqrt_alphas_cumprod, t, nd) * x_t
            - _extract(s.sqrt_one_minus_alphas_cumprod, t, nd) * v
        )

    def q_posterior(self, x_start, x_t, t):
        s = self.sched
        nd = x_t.ndim
        mean = (
            _extract(s.posterior_mean_coef1, t, nd) * x_start
            + _extract(s.posterior_mean_coef2, t, nd) * x_t
        )
        var = _extract(s.posterior_variance, t, nd)
        log_var = _extract(s.posterior_log_variance_clipped, t, nd)
        return mean, var, log_var

    def q_sample(self, x_start, t, noise):
        s = self.sched
        nd = x_start.ndim
        return (
            _extract(s.sqrt_alphas_cumprod, t, nd) * x_start
            + _extract(s.sqrt_one_minus_alphas_cumprod, t, nd) * noise
        )

    # ----------------------------------------------------------- prediction

    def model_predictions(
        self,
        params,
        x,
        t,
        *,
        guidance: Optional[GuidanceConfig] = None,
        clip_x_start: bool = False,
        rederive_pred_noise: bool = False,
    ) -> ModelPrediction:
        out = self.model_apply(params, x, t)
        clip = (lambda v: jnp.clip(v, -1.0, 1.0)) if clip_x_start else (lambda v: v)

        if self.objective == "pred_noise":
            pred_noise = out
            x_start = clip(self.predict_start_from_noise(x, t, pred_noise))
        elif self.objective == "pred_x0":
            x_start = clip(out)
            pred_noise = self.predict_noise_from_start(x, t, x_start)
        else:  # pred_v
            x_start = clip(self.predict_start_from_v(x, t, out))
            pred_noise = self.predict_noise_from_start(x, t, x_start)

        if guidance is not None:
            g = guidance.grad_fn(x_start) * guidance.step_weight(t).reshape(
                t.shape + (1,) * (x.ndim - 1)
            )
            if guidance.proj is not None:
                pred_noise = guidance.proj(pred_noise, g)
            else:
                pred_noise = pred_noise + g
            x_start = clip(self.predict_start_from_noise(x, t, pred_noise))
        # reference rederives unconditionally (guided or not) so pred_noise
        # is consistent with the clipped x_start (``diffusion_1d.py:226-227``)
        if clip_x_start and rederive_pred_noise:
            pred_noise = self.predict_noise_from_start(x, t, x_start)

        return ModelPrediction(pred_noise, x_start)

    # ------------------------------------------------------------- training

    def p_losses(self, params, rng, x_start, t, *, noise=None):
        """Conditioned denoising loss; reference ``diffusion_1d.py:529-645``.

        Conditioning values during training come from ``x_start`` itself (the
        dataset already packs condition channels); the loss target is zeroed
        at conditioned/padded locations.
        """
        if noise is None:
            noise = jax.random.normal(rng, x_start.shape, x_start.dtype)
        x = self.q_sample(x_start, t, noise)
        if self.spec is not None:
            x = self.spec.apply(x, x_start)

        model_out = self.model_apply(params, x, t)

        if self.objective == "pred_noise":
            target = noise
        elif self.objective == "pred_x0":
            target = x_start
        else:
            target = self.predict_v(x_start, t, noise)
        if self.spec is not None:
            target = self.spec.mask_target(target)

        loss = (model_out - target) ** 2
        if self.loss_channel_weight is not None:
            loss = loss * jnp.asarray(self.loss_channel_weight, loss.dtype)
        loss = loss.reshape(loss.shape[0], -1).mean(axis=1)
        loss = loss * self.sched.loss_weight[t]
        return loss.mean()

    def loss(self, params, rng, batch):
        """Sample timesteps and compute the training loss for a batch."""
        rng_t, rng_n = jax.random.split(rng)
        t = jax.random.randint(rng_t, (batch.shape[0],), 0, self.num_timesteps)
        return self.p_losses(params, rng_n, batch, t)

    # ------------------------------------------------------------- sampling

    def _apply_cond(self, x, cond_values):
        if self.spec is None:
            return x
        return self.spec.apply(x, cond_values)

    def ddim_sample(
        self,
        params,
        rng,
        batch_size: int,
        *,
        cond_values: Optional[Array] = None,
        guidance: Optional[GuidanceConfig] = None,
        eta: Optional[float] = None,
        steps: Optional[int] = None,
        batch_sharding=None,
    ) -> Array:
        """DDIM sampler as one ``lax.scan`` (reference ``diffusion_1d.py:376-460``).

        ``batch_sharding``: optional ``NamedSharding`` placing the batch axis
        on a device mesh — the init noise and conditions are put there and
        GSPMD shards the whole sampling scan across chips (multi-chip eval).

        Deliberate deviation: conditions are re-imposed on the RETURNED
        sample too.  The Burgers reference does the same
        (``diffusion_1d.py:437-457``) but the smoke reference returns the
        final x_start with its condition channels left at the model's
        denoised estimate (``diffusion_2d.py:897-933``); those channels are
        never scored, and the conditioning contract holding on the output is
        what the SR chain and the evaluators assume.
        """
        eta = self.ddim_eta if eta is None else eta
        steps = steps or self.sampling_timesteps
        T = self.num_timesteps
        times = np.linspace(-1, T - 1, steps + 1).astype(np.int32)[::-1]
        pairs = np.stack([times[:-1], times[1:]], axis=1)  # [S, 2]

        shape = (batch_size,) + self.state_shape
        rng, rng_init = jax.random.split(rng)
        img = jax.random.normal(rng_init, shape, jnp.float32)
        if batch_sharding is not None:
            img = jax.device_put(img, batch_sharding)
            if cond_values is not None:
                cond_values = jax.device_put(cond_values, batch_sharding)

        def body(carry, pair):
            img, rng = carry
            time, time_next = pair[0], pair[1]
            img = self._apply_cond(img, cond_values)
            t_b = jnp.full((batch_size,), time, jnp.int32)
            pred_noise, x_start = self.model_predictions(
                params,
                img,
                t_b,
                guidance=guidance,
                clip_x_start=True,
                rederive_pred_noise=True,
            )
            alpha = self.sched.alphas_cumprod[time]
            alpha_next = jnp.where(
                time_next < 0, 1.0, self.sched.alphas_cumprod[jnp.maximum(time_next, 0)]
            )
            sigma = eta * jnp.sqrt(
                jnp.maximum((1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha), 0.0)
            )
            c = jnp.sqrt(jnp.maximum(1 - alpha_next - sigma**2, 0.0))
            rng, rng_n = jax.random.split(rng)
            noise = jax.random.normal(rng_n, shape, jnp.float32)
            img_next = x_start * jnp.sqrt(alpha_next) + c * pred_noise + sigma * noise
            img_next = jnp.where(time_next < 0, x_start, img_next)
            return (img_next, rng), None

        (img, _), _ = jax.lax.scan(body, (img, rng), jnp.asarray(pairs))
        return self._apply_cond(img, cond_values)

    def p_sample_loop(
        self,
        params,
        rng,
        batch_size: int,
        *,
        cond_values: Optional[Array] = None,
        guidance: Optional[GuidanceConfig] = None,
        batch_sharding=None,
    ) -> Array:
        """Ancestral DDPM sampler as one ``lax.scan``
        (reference ``diffusion_1d.py:310-373``)."""
        T = self.num_timesteps
        shape = (batch_size,) + self.state_shape
        rng, rng_init = jax.random.split(rng)
        img = jax.random.normal(rng_init, shape, jnp.float32)
        if batch_sharding is not None:
            img = jax.device_put(img, batch_sharding)
            if cond_values is not None:
                cond_values = jax.device_put(cond_values, batch_sharding)

        def body(carry, t):
            img, rng = carry
            img = self._apply_cond(img, cond_values)
            t_b = jnp.full((batch_size,), t, jnp.int32)
            # reference order (``diffusion_1d.py:242-247``, ``diffusion_2d.py:758-764``):
            # model_predictions runs UNclipped — guidance sees the raw x_start
            # estimate — and the clamp happens before the posterior
            pred_noise, x_start = self.model_predictions(
                params, img, t_b, guidance=guidance, clip_x_start=False
            )
            if self.clip_denoised:
                x_start = jnp.clip(x_start, -1.0, 1.0)
            mean, _, log_var = self.q_posterior(x_start, img, t_b)
            rng, rng_n = jax.random.split(rng)
            noise = jax.random.normal(rng_n, shape, jnp.float32)
            img_next = mean + jnp.exp(0.5 * log_var) * noise * (t > 0)
            return (img_next, rng), None

        ts = jnp.arange(T - 1, -1, -1)
        (img, _), _ = jax.lax.scan(body, (img, rng), ts)
        return self._apply_cond(img, cond_values)

    def sample(self, params, rng, batch_size: int, **kwargs) -> Array:
        if self.is_ddim_sampling:
            return self.ddim_sample(params, rng, batch_size, **kwargs)
        kwargs.pop("eta", None)
        kwargs.pop("steps", None)
        return self.p_sample_loop(params, rng, batch_size, **kwargs)
