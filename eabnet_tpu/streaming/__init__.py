from eabnet_tpu.streaming.stream import (  # noqa: F401
    StreamingEaBNet,
    StreamingComposed,
)
