"""Diffusion noise schedules and samplers.

Replaces the reference's diffusers `DDPMScheduler` (training noise +
generation: the reference injects its DDPM scheduler into the pipeline,
`sd.py:154-158`, so sampling is ancestral DDPM over a strided timestep
subset).  A DDIM sampler is included as the fast deterministic option.

Everything is a pure function of precomputed fp32 tables, jit/scan friendly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    prediction_type: str = "epsilon"  # or "v_prediction"

    def betas(self) -> jax.Array:
        if self.beta_schedule == "scaled_linear":
            return (
                jnp.linspace(
                    self.beta_start ** 0.5,
                    self.beta_end ** 0.5,
                    self.num_train_timesteps,
                    dtype=jnp.float32,
                )
                ** 2
            )
        if self.beta_schedule == "linear":
            return jnp.linspace(
                self.beta_start, self.beta_end, self.num_train_timesteps,
                dtype=jnp.float32,
            )
        raise ValueError(self.beta_schedule)

    def alphas_cumprod(self) -> jax.Array:
        return jnp.cumprod(1.0 - self.betas())

    # ------------------------------------------------------------------ #
    # training                                                            #
    # ------------------------------------------------------------------ #

    def add_noise(self, latents, noise, timesteps):
        ac = self.alphas_cumprod()
        a = jnp.sqrt(ac[timesteps])[:, None, None, None]
        s = jnp.sqrt(1.0 - ac[timesteps])[:, None, None, None]
        return a * latents + s * noise

    def get_velocity(self, latents, noise, timesteps):
        ac = self.alphas_cumprod()
        a = jnp.sqrt(ac[timesteps])[:, None, None, None]
        s = jnp.sqrt(1.0 - ac[timesteps])[:, None, None, None]
        return a * noise - s * latents

    def training_target(self, latents, noise, timesteps):
        if self.prediction_type == "epsilon":
            return noise
        if self.prediction_type == "v_prediction":
            return self.get_velocity(latents, noise, timesteps)
        raise ValueError(self.prediction_type)

    # ------------------------------------------------------------------ #
    # sampling                                                            #
    # ------------------------------------------------------------------ #

    def inference_timesteps(self, num_inference_steps: int) -> jax.Array:
        """Strided timesteps, descending (diffusers "leading" spacing)."""
        step = self.num_train_timesteps // num_inference_steps
        t = (jnp.arange(num_inference_steps) * step).round().astype(jnp.int32)
        return t[::-1]

    def _pred_x0_eps(self, model_out, sample, t):
        """(x0, eps) from the model output at timestep t."""
        ac = self.alphas_cumprod()
        a_t = ac[t]
        sq_a, sq_1ma = jnp.sqrt(a_t), jnp.sqrt(1.0 - a_t)
        if self.prediction_type == "epsilon":
            eps = model_out
            x0 = (sample - sq_1ma * eps) / sq_a
        elif self.prediction_type == "v_prediction":
            x0 = sq_a * sample - sq_1ma * model_out
            eps = sq_a * model_out + sq_1ma * sample
        else:
            raise ValueError(self.prediction_type)
        return x0, eps

    def ddpm_step(self, model_out, t, t_prev, sample, noise):
        """One ancestral DDPM step from t to t_prev (noise: same shape)."""
        ac = self.alphas_cumprod()
        a_t = ac[t]
        a_prev = jnp.where(t_prev >= 0, ac[jnp.maximum(t_prev, 0)], 1.0)
        x0, eps = self._pred_x0_eps(model_out, sample, t)
        x0 = jnp.clip(x0, -1e4, 1e4)

        alpha_t = a_t / a_prev  # current (strided) alpha
        beta_t = 1.0 - alpha_t
        # posterior mean coefficients (DDPM eq. 7)
        coef_x0 = jnp.sqrt(a_prev) * beta_t / (1.0 - a_t)
        coef_xt = jnp.sqrt(alpha_t) * (1.0 - a_prev) / (1.0 - a_t)
        mean = coef_x0 * x0 + coef_xt * sample
        var = beta_t * (1.0 - a_prev) / (1.0 - a_t)
        var = jnp.clip(var, 1e-20)
        add = jnp.where(t_prev >= 0, jnp.sqrt(var) * noise, 0.0)
        return mean + add

    def ddim_step(self, model_out, t, t_prev, sample, eta: float = 0.0):
        ac = self.alphas_cumprod()
        a_t = ac[t]
        a_prev = jnp.where(t_prev >= 0, ac[jnp.maximum(t_prev, 0)], 1.0)
        x0, eps = self._pred_x0_eps(model_out, sample, t)
        dir_xt = jnp.sqrt(1.0 - a_prev) * eps
        return jnp.sqrt(a_prev) * x0 + dir_xt
