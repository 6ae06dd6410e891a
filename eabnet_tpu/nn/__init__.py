from eabnet_tpu.nn.norms import (  # noqa: F401
    PReLU,
    InstanceNorm,
    CumulativeLayerNorm,
    NormSwitch,
)
from eabnet_tpu.nn.blocks import (  # noqa: F401
    GateConv2d,
    GateConvTranspose2d,
    Conv2dUnit,
    Deconv2dUnit,
    EnUnetModule,
    U2NetEncoder,
    U2NetDecoder,
    UNetEncoder,
    UNetDecoder,
    SqueezedTCM,
    SqueezedTCNGroup,
)
from eabnet_tpu.nn.lstm import LSTM  # noqa: F401
