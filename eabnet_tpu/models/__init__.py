from eabnet_tpu.models.eabnet import EaBNet, LSTMBeamformer  # noqa: F401
from eabnet_tpu.models.gagnet import GaGNet  # noqa: F401
from eabnet_tpu.models.composed import EaBNetWithPostNet, build_model  # noqa: F401
