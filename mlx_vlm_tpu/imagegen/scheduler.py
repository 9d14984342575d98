"""Flow-match Euler scheduler for rectified-flow image generation.

Role parity: reference mlx_vlm/models/flux2/scheduler.py
(FlowMatchEulerDiscreteScheduler) — resolution-dependent exponential time
shift (empirical mu), sigma schedule 1 -> 1/N, Euler step x += dt * v.

TPU design: the schedule is tiny host-side numpy computed once; the Euler
update is a jax expression fused into the jitted denoise step.
"""

from __future__ import annotations

import numpy as np


def _empirical_mu(image_seq_len: int, num_steps: int) -> float:
    a1, b1 = 8.73809524e-05, 1.89833333
    a2, b2 = 0.00016927, 0.45666666
    if image_seq_len > 4300:
        return float(a2 * image_seq_len + b2)
    m_200 = a2 * image_seq_len + b2
    m_10 = a1 * image_seq_len + b1
    a = (m_200 - m_10) / 190.0
    b = m_200 - 200.0 * a
    return float(a * num_steps + b)


class FlowMatchEulerScheduler:
    """sigmas [N+1] (last 0) and timesteps [N] in train-time units."""

    def __init__(self, image_seq_len: int, num_inference_steps: int,
                 num_train_timesteps: int = 1000):
        sigmas = np.linspace(
            1.0, 1.0 / num_inference_steps, num_inference_steps,
            dtype=np.float64,
        )
        mu = _empirical_mu(image_seq_len, num_inference_steps)
        sigmas = np.exp(mu) / (np.exp(mu) + (1.0 / sigmas - 1.0))
        self.timesteps = (sigmas * num_train_timesteps).astype(np.float32)
        self.sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)

    def step(self, noise, step_index: int, latents):
        dt = float(self.sigmas[step_index + 1] - self.sigmas[step_index])
        return latents + dt * noise.astype(latents.dtype)
