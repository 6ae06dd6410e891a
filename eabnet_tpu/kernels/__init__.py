from eabnet_tpu.kernels.lstm_bf import lstm_bf_pallas  # noqa: F401
