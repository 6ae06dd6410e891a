from eabnet_tpu.dsp.stft import (  # noqa: F401
    hann_window,
    stft,
    istft,
    power_compress,
    power_uncompress,
    prepare_data,
    stft_to_wav,
    StreamingStft,
    StreamingIstft,
)
