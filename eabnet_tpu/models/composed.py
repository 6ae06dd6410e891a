"""EaBNet + GaGNet composed model (reference: EaBNet.py:127-155).

The beamformer output feeds the post-filter through a `stop_gradient`
(the reference's `.detach()`, EaBNet.py:142), so post-filter training never
backprops into the beamformer; `freeze_eabnet` additionally zeroes the
beamformer's gradients in the train step (see eabnet_tpu/train/step.py).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from eabnet_tpu.config import ComposedConfig
from eabnet_tpu.models.eabnet import EaBNet
from eabnet_tpu.models.gagnet import GaGNet


class EaBNetWithPostNet(nn.Module):
    """Flagship model: causal beamformer + glance-gaze refinement."""

    cfg: ComposedConfig

    @nn.compact
    def __call__(self, noisy_stft: jnp.ndarray,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        """noisy_stft: (B, T, F, M, 2).

        Returns (native (B, T, F, 2) layouts):
          esti0    — beamformer estimate
          esti1    — list of q post-filter stage outputs
          esti     — final refined spectrum (last stage)
        """
        esti0 = EaBNet(self.cfg.eabnet, name="eabnet")(noisy_stft, train)
        ref = noisy_stft[..., self.cfg.ref_mic, :]  # (B, T, F, 2)
        esti1 = GaGNet(self.cfg.gagnet, name="postnet")(
            ref, jax.lax.stop_gradient(esti0), train
        )
        return {"esti0": esti0, "esti1": esti1, "esti": esti1[-1]}


def build_model(cfg: ComposedConfig) -> EaBNetWithPostNet:
    """Factory mirroring the reference's `make_eabnet_with_postnet(args)`
    (EaBNet.py:815-816)."""
    return EaBNetWithPostNet(cfg)
