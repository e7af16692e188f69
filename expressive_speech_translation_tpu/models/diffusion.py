"""Guided diffusion: DDPM/DDIM sampling, respacing, schedule resampling, EMA.

Re-implements the vendored guided-diffusion core the reference's legacy
diff2lip lip-sync uses (Backend/diff2lip/guided_diffusion/ — SURVEY.md §2.16):

- ``gaussian_diffusion.py`` (843 LoC): beta schedules, q/posterior math,
  p_sample_loop (DDPM) and ddim_sample_loop, MSE + VB losses → here as a
  :class:`GaussianDiffusion` over jnp with ``lax``-friendly loops.
- ``respace.py``: timestep striding (``space_timesteps``) for few-step sampling.
- ``resample.py``: uniform and loss-second-moment schedule samplers.
- ``nn.py``: timestep embeddings, EMA update.
- ``fp16_util.py`` MixedPrecisionTrainer: unnecessary on TPU — bf16 needs no
  loss scaling (SURVEY.md §2.19 mixed-precision row); train in bf16 with f32
  params via train/sft.py conventions instead.

TPU-first: the sampling loop is one ``lax.fori_loop`` whose body is the fused
denoise step; shapes are static; classifier-free guidance composes at the
model-fn level.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Dict, Optional, Sequence, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# -------------------------------------------------------------- beta schedules


def linear_betas(steps: int, *, start: float = 1e-4, end: float = 0.02) -> np.ndarray:
    scale = 1000.0 / steps  # guided-diffusion scales to the 1000-step reference
    # clamp: the scaled-linear convention exceeds 1.0 for very small step counts
    return np.clip(np.linspace(scale * start, scale * end, steps, dtype=np.float64), 1e-8, 0.999)


def cosine_betas(steps: int, *, max_beta: float = 0.999) -> np.ndarray:
    def alpha_bar(t):
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

    betas = []
    for i in range(steps):
        betas.append(min(1 - alpha_bar((i + 1) / steps) / alpha_bar(i / steps), max_beta))
    return np.asarray(betas, np.float64)


def named_beta_schedule(name: str, steps: int) -> np.ndarray:
    if name == "linear":
        return linear_betas(steps)
    if name == "cosine":
        return cosine_betas(steps)
    raise ValueError(f"unknown beta schedule {name!r}")


# ------------------------------------------------------------------ respacing


def space_timesteps(num_timesteps: int, section_counts: str | Sequence[int]) -> Set[int]:
    """guided_diffusion.respace.space_timesteps parity: 'ddimN' or per-section
    counts → the retained original-timestep indices."""
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired = int(section_counts[4:])
            for stride in range(1, num_timesteps):
                if len(range(0, num_timesteps, stride)) == desired:
                    return set(range(0, num_timesteps, stride))
            raise ValueError(f"cannot create exactly {desired} steps with an integer stride")
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start = 0
    taken: Set[int] = set()
    for i, count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if count > size:
            raise ValueError(f"cannot take {count} steps from a section of {size}")
        stride = 1 if count <= 1 else (size - 1) / (count - 1)
        cur = 0.0
        for _ in range(count):
            taken.add(start + round(cur))
            cur += stride
        start += size
    return taken


# ---------------------------------------------------------------- diffusion


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    steps: int = 1000
    schedule: str = "linear"
    # model output: 'epsilon' (noise prediction) or 'x_start'
    predict: str = "epsilon"
    # variance: 'fixed_small' | 'fixed_large' | 'learned_range'
    var_type: str = "fixed_small"
    clip_denoised: bool = True


class GaussianDiffusion:
    """All-precomputed diffusion math (gaussian_diffusion.py parity)."""

    def __init__(self, cfg: DiffusionConfig = DiffusionConfig(),
                 *, use_timesteps: Optional[Set[int]] = None):
        self.cfg = cfg
        betas = named_beta_schedule(cfg.schedule, cfg.steps)

        # respacing (respace.py SpacedDiffusion): keep a subset, recompute betas
        self.timestep_map: Optional[np.ndarray] = None
        if use_timesteps is not None:
            alphas_cum = np.cumprod(1.0 - betas)
            last = 1.0
            new_betas, tmap = [], []
            for i, ac in enumerate(alphas_cum):
                if i in use_timesteps:
                    new_betas.append(1 - ac / last)
                    last = ac
                    tmap.append(i)
            betas = np.asarray(new_betas)
            self.timestep_map = np.asarray(tmap, np.int32)

        self.num_timesteps = len(betas)
        alphas = 1.0 - betas
        self.betas = betas
        self.alphas_cumprod = np.cumprod(alphas)
        self.alphas_cumprod_prev = np.append(1.0, self.alphas_cumprod[:-1])
        self.sqrt_alphas_cumprod = np.sqrt(self.alphas_cumprod)
        self.sqrt_one_minus_alphas_cumprod = np.sqrt(1.0 - self.alphas_cumprod)
        self.sqrt_recip_alphas_cumprod = np.sqrt(1.0 / self.alphas_cumprod)
        self.sqrt_recipm1_alphas_cumprod = np.sqrt(1.0 / self.alphas_cumprod - 1.0)
        self.posterior_variance = (
            betas * (1.0 - self.alphas_cumprod_prev) / (1.0 - self.alphas_cumprod)
        )
        self.posterior_log_variance_clipped = np.log(
            np.append(self.posterior_variance[1], self.posterior_variance[1:])
        )
        self.posterior_mean_coef1 = (
            betas * np.sqrt(self.alphas_cumprod_prev) / (1.0 - self.alphas_cumprod)
        )
        self.posterior_mean_coef2 = (
            (1.0 - self.alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - self.alphas_cumprod)
        )

    # ------------------------------------------------------------- utilities

    @staticmethod
    def _gather(table: np.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
        out = jnp.asarray(table, jnp.float32)[t]
        return out.reshape(out.shape + (1,) * (ndim - out.ndim))

    def model_t(self, t: jnp.ndarray) -> jnp.ndarray:
        """Map respaced index → original timestep fed to the model."""
        if self.timestep_map is None:
            return t
        return jnp.asarray(self.timestep_map)[t]

    # ------------------------------------------------------------ forward q()

    def q_sample(self, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
        return (
            self._gather(self.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + self._gather(self.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
        )

    def predict_xstart_from_eps(self, x_t, t, eps):
        return (
            self._gather(self.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
            - self._gather(self.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * eps
        )

    def q_posterior_mean(self, x_start, x_t, t):
        return (
            self._gather(self.posterior_mean_coef1, t, x_t.ndim) * x_start
            + self._gather(self.posterior_mean_coef2, t, x_t.ndim) * x_t
        )

    # ----------------------------------------------------------- p_mean_var

    def p_mean_variance(self, model_fn, x_t, t, **model_kwargs):
        out = model_fn(x_t, self.model_t(t), **model_kwargs)
        if self.cfg.predict == "epsilon":
            x_start = self.predict_xstart_from_eps(x_t, t, out)
        else:
            x_start = out
        if self.cfg.clip_denoised:
            x_start = jnp.clip(x_start, -1.0, 1.0)
        mean = self.q_posterior_mean(x_start, x_t, t)
        if self.cfg.var_type == "fixed_small":
            log_var = self._gather(self.posterior_log_variance_clipped, t, x_t.ndim)
        else:  # fixed_large
            log_var = self._gather(np.log(np.maximum(self.betas, 1e-20)), t, x_t.ndim)
        return mean, log_var, x_start

    # -------------------------------------------------------------- sampling

    def p_sample_loop(self, model_fn, shape, key, **model_kwargs) -> jnp.ndarray:
        """Ancestral DDPM sampling (p_sample_loop parity) as one fori_loop."""
        key, k0 = jax.random.split(key)
        x_init = jax.random.normal(k0, shape)

        def body(i, carry):
            x, key = carry
            t = jnp.full((shape[0],), self.num_timesteps - 1 - i, jnp.int32)
            mean, log_var, _ = self.p_mean_variance(model_fn, x, t, **model_kwargs)
            key, kn = jax.random.split(key)
            noise = jax.random.normal(kn, shape)
            not_last = (self.num_timesteps - 1 - i) > 0
            x = mean + jnp.where(not_last, 1.0, 0.0) * jnp.exp(0.5 * log_var) * noise
            return x, key

        x, _ = jax.lax.fori_loop(0, self.num_timesteps, body, (x_init, key))
        return x

    def ddim_sample_loop(self, model_fn, shape, key, *, eta: float = 0.0, **model_kwargs) -> jnp.ndarray:
        """Deterministic (eta=0) / stochastic DDIM (ddim_sample_loop parity)."""
        key, k0 = jax.random.split(key)
        x_init = jax.random.normal(k0, shape)
        acp = jnp.asarray(self.alphas_cumprod, jnp.float32)
        acp_prev = jnp.asarray(self.alphas_cumprod_prev, jnp.float32)

        def body(i, carry):
            x, key = carry
            ti = self.num_timesteps - 1 - i
            t = jnp.full((shape[0],), ti, jnp.int32)
            _, _, x_start = self.p_mean_variance(model_fn, x, t, **model_kwargs)
            eps = (
                self._gather(self.sqrt_recip_alphas_cumprod, t, x.ndim) * x - x_start
            ) / self._gather(self.sqrt_recipm1_alphas_cumprod, t, x.ndim)
            a_t = self._gather(np.asarray(self.alphas_cumprod), t, x.ndim)
            a_prev = self._gather(np.asarray(self.alphas_cumprod_prev), t, x.ndim)
            sigma = (
                eta * jnp.sqrt((1 - a_prev) / (1 - a_t)) * jnp.sqrt(1 - a_t / a_prev)
            )
            key, kn = jax.random.split(key)
            noise = jax.random.normal(kn, shape)
            mean = jnp.sqrt(a_prev) * x_start + jnp.sqrt(
                jnp.maximum(1 - a_prev - sigma**2, 0.0)
            ) * eps
            not_last = ti > 0
            x = mean + jnp.where(not_last, 1.0, 0.0) * sigma * noise
            return x, key

        x, _ = jax.lax.fori_loop(0, self.num_timesteps, body, (x_init, key))
        return x

    # ---------------------------------------------------------------- losses

    def training_loss(self, model_fn, x_start, t, key, **model_kwargs) -> Dict[str, jnp.ndarray]:
        """MSE loss on eps (losses.py/gaussian_diffusion training_losses core)."""
        noise = jax.random.normal(key, x_start.shape)
        x_t = self.q_sample(x_start, t, noise)
        out = model_fn(x_t, self.model_t(t), **model_kwargs)
        target = noise if self.cfg.predict == "epsilon" else x_start
        mse = jnp.mean(jnp.square(out - target), axis=tuple(range(1, x_start.ndim)))
        return {"loss": jnp.mean(mse), "per_sample": mse}


# -------------------------------------------------------------------- sampler


class UniformSampler:
    """resample.UniformSampler parity."""

    def __init__(self, diffusion: GaussianDiffusion):
        self.n = diffusion.num_timesteps

    def sample(self, key, batch: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        t = jax.random.randint(key, (batch,), 0, self.n)
        return t, jnp.ones((batch,))


class LossSecondMomentResampler:
    """resample.LossSecondMomentResampler parity: sample timesteps ∝ RMS of
    recent per-timestep losses, with importance weights."""

    def __init__(self, diffusion: GaussianDiffusion, *, history: int = 10, uniform_prob: float = 0.001):
        self.n = diffusion.num_timesteps
        self.history = history
        self.uniform_prob = uniform_prob
        self._losses = np.zeros((self.n, history), np.float64)
        self._counts = np.zeros(self.n, np.int64)

    def weights(self) -> np.ndarray:
        if not (self._counts == self.history).all():
            return np.ones(self.n)
        w = np.sqrt(np.mean(self._losses**2, axis=-1))
        w = w / w.sum()
        return w * (1 - self.uniform_prob) + self.uniform_prob / self.n

    def sample(self, key, batch: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        w = self.weights()
        p = w / w.sum()
        t = jax.random.choice(key, self.n, (batch,), p=jnp.asarray(p))
        weights = 1.0 / (self.n * p[np.asarray(t)])
        return t, jnp.asarray(weights, jnp.float32)

    def update_with_losses(self, ts: np.ndarray, losses: np.ndarray) -> None:
        for t, loss in zip(np.asarray(ts), np.asarray(losses)):
            idx = int(self._counts[t]) % self.history
            self._losses[t, idx] = float(loss)
            self._counts[t] = min(self._counts[t] + 1, self.history)


# ------------------------------------------------------------------------ nn


def timestep_embedding(t: jnp.ndarray, dim: int, *, max_period: float = 10000.0) -> jnp.ndarray:
    """guided_diffusion.nn.timestep_embedding parity: [B] → [B, dim]."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def ema_update(ema_params, params, rate: float = 0.9999):
    """guided_diffusion.nn.update_ema parity over pytrees."""
    return jax.tree_util.tree_map(
        lambda e, p: e * rate + p.astype(e.dtype) * (1 - rate), ema_params, params
    )
