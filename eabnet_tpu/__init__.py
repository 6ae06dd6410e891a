"""eabnet_tpu — a TPU-native (JAX/XLA/Pallas) multichannel speech-enhancement framework.

Re-designed from scratch with the capabilities of the EaBNet reference stack
(all-neural causal beamformer + GaGNet post-filter + online room-acoustics data
synthesis + distributed training + metric evaluation), built TPU-first:

- STFT front-end as fused framing + windowed real-DFT matmuls (MXU-friendly)
- Flax model zoo with a single parameterized block library
- `shard_map`/`pjit` SPMD data parallelism over a `jax.sharding.Mesh`
- streaming per-frame inference via `lax.scan` with carried state
- host-side data synthesis engine (image-source RIR, SNR mixing) with a C++
  fast path and a pure-numpy fallback
"""

__version__ = "0.1.0"

from eabnet_tpu.config import (  # noqa: F401
    EaBNetConfig,
    GaGNetConfig,
    ComposedConfig,
    StftConfig,
    TrainConfig,
    DataConfig,
)
