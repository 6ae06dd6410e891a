from eabnet_tpu.losses.losses import (  # noqa: F401
    frame_mask,
    com_mag_mse_loss,
    stagewise_com_mag_mse_loss,
    eabnet_with_postnet_loss,
)
