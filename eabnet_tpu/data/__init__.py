from eabnet_tpu.data.scenes import Scene, load_settings, sample_scene  # noqa: F401
from eabnet_tpu.data.mixer import active_noise_rms, mix_at_snr  # noqa: F401
from eabnet_tpu.data.rir import (  # noqa: F401
    inverse_sabine,
    shoebox_rir,
    direct_path_rir,
    simulate_scene,
)
from eabnet_tpu.data.datasets import (  # noqa: F401
    FakeDataset,
    OnlineMcseDataset,
    OfflineMcseDataset,
    BatchLoader,
    make_dataset,
)
