"""Streaming == offline equivalence (the architecture is strictly causal,
so frame-by-frame inference with carried state must reproduce the offline
output exactly)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eabnet_tpu.config import ComposedConfig, EaBNetConfig, GaGNetConfig
from eabnet_tpu.models import EaBNet, EaBNetWithPostNet
from eabnet_tpu.streaming import StreamingComposed, StreamingEaBNet

B, T, F, M = 1, 12, 161, 3


def _eab_cfg(norm):
    return EaBNetConfig(c=8, M=M, embed_dim=8, cd1=8, p=2, q=1,
                        norm_type=norm)


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(11)
    return jnp.asarray(
        rng.standard_normal((B, T, F, M, 2)).astype(np.float32) * 0.3
    )


@pytest.mark.slow
def test_streaming_eabnet_matches_offline_cln(frames):
    cfg = _eab_cfg("cLN")
    model = EaBNet(cfg)
    variables = model.init(jax.random.key(0), frames)
    offline = np.asarray(model.apply(variables, frames))

    s = StreamingEaBNet(cfg, variables["params"])
    streamed = np.asarray(s.run(frames))
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, atol=1e-4)


def test_streaming_eabnet_step_by_step(frames):
    cfg = _eab_cfg("cLN")
    model = EaBNet(cfg)
    variables = model.init(jax.random.key(0), frames)
    offline = np.asarray(model.apply(variables, frames))

    s = StreamingEaBNet(cfg, variables["params"])
    state = s.init_state(B)
    step = jax.jit(s.step)
    outs = []
    for t in range(T):
        state, esti = step(state, frames[:, t])
        outs.append(np.asarray(esti))
    streamed = np.stack(outs, axis=1)
    np.testing.assert_allclose(streamed, offline, atol=1e-4)


@pytest.mark.slow
def test_streaming_batched():
    """Streaming with batch > 1 matches offline per-sample."""
    cfg = _eab_cfg("cLN")
    rng = np.random.default_rng(21)
    x = jnp.asarray(
        rng.standard_normal((2, 8, F, M, 2)).astype(np.float32) * 0.3
    )
    model = EaBNet(cfg)
    variables = model.init(jax.random.key(0), x)
    offline = np.asarray(model.apply(variables, x))
    s = StreamingEaBNet(cfg, variables["params"])
    streamed = np.asarray(s.run(x))
    np.testing.assert_allclose(streamed, offline, atol=1e-4)


@pytest.mark.slow
def test_multi_stream_independence():
    """Serving N concurrent streams from ONE batched state is exactly
    per-stream serving: the batch dimension never mixes (all ops are
    batch-parallel), so stream i of a ragged batch — including zero-fed
    frames past a finished stream's end — equals its own batch-1 run.
    This is the correctness contract behind `cli.stream <dir>` and the
    streams/chip capacity benchmark (tools/bench_streaming.py --streams).
    """
    cfg = ComposedConfig(
        eabnet=_eab_cfg("cLN"),
        gagnet=GaGNetConfig(c=8, cd1=8, p=1, q=1, dilas=(1, 2),
                            norm_type="cLN"),
    )
    rng = np.random.default_rng(33)
    t = 10
    x = jnp.asarray(
        rng.standard_normal((3, t, F, M, 2)).astype(np.float32) * 0.3
    )
    # ragged streams: stream 1 "ends" early (zero frames after 6), the
    # realistic lockstep-serving shape
    x = x.at[1, 6:].set(0.0)

    model = EaBNetWithPostNet(cfg)
    params = jax.jit(model.init)(jax.random.key(0), x)["params"]
    s = StreamingComposed(cfg, params)

    # run() returns the composed esti — its equality implies the whole
    # chain (beamformer esti0 included, which the post-filter consumes)
    # is batch-independent end to end
    batched = np.asarray(s.run(x))
    for i in range(3):
        solo = np.asarray(s.run(x[i : i + 1]))
        np.testing.assert_allclose(batched[i], solo[0], atol=1e-5)


def test_streaming_rejects_instance_norm(frames):
    cfg = _eab_cfg("IN")
    with pytest.raises(ValueError, match="cannot stream"):
        StreamingEaBNet(cfg, {})


@pytest.mark.parametrize(
    "kw",
    [{"is_u2": False}, {"bf_type": "cnn"}, {"topo_type": "miso"}],
    ids=["unet", "cnn_head", "miso"],
)
def test_streaming_variants_match_offline(frames, kw):
    cfg = EaBNetConfig(c=8, M=M, embed_dim=8, cd1=8, p=2, q=1,
                       norm_type="cLN", **kw)
    model = EaBNet(cfg)
    variables = model.init(jax.random.key(0), frames)
    offline = np.asarray(model.apply(variables, frames))
    s = StreamingEaBNet(cfg, variables["params"])
    streamed = np.asarray(s.run(frames))
    np.testing.assert_allclose(streamed, offline, atol=1e-4)


def test_streaming_composed_matches_offline(frames):
    cfg = ComposedConfig(
        eabnet=_eab_cfg("cLN"),
        gagnet=GaGNetConfig(c=8, cd1=8, p=1, q=1, dilas=(1, 2),
                            norm_type="cLN"),
    )
    model = EaBNetWithPostNet(cfg)
    variables = model.init(jax.random.key(0), frames)
    offline = np.asarray(model.apply(variables, frames)["esti"])

    s = StreamingComposed(cfg, variables["params"])
    streamed = np.asarray(s.run(frames))
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, atol=1e-4)
