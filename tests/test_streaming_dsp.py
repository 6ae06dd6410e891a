"""Streaming STFT/iSTFT == offline interior equivalence."""

import jax.numpy as jnp
import numpy as np
import pytest

from eabnet_tpu.config import StftConfig
from eabnet_tpu.dsp import (
    StreamingIstft,
    StreamingStft,
    istft,
    stft,
    power_compress,
)


def test_streaming_stft_matches_offline(rng):
    cfg = StftConfig()
    hop, n_fft = cfg.hop_samples, cfg.fft_num
    n = hop * 50
    x = rng.standard_normal((2, n)).astype(np.float32)

    # offline frame t covers samples [t*hop - n_fft/2, t*hop + n_fft/2);
    # streaming push t covers the same window (zeros instead of the
    # reflect pad on the lead-in frames)
    offline = np.asarray(
        power_compress(stft(jnp.asarray(x), n_fft, hop, n_fft))
    )  # (B, T, F, 2)

    s = StreamingStft(cfg)
    state = s.init_state(2)
    frames = []
    for t in range(n // hop):
        state, frame = s.push(state, jnp.asarray(x[:, t*hop:(t+1)*hop]))
        frames.append(np.asarray(frame))
    streamed = np.stack(frames, axis=1)  # (B, T, F, 2)

    # compare the interior (skip the lead-in frames where padding differs)
    t_s = streamed.shape[1]
    np.testing.assert_allclose(
        streamed[:, 2:], offline[:, 2:t_s], atol=2e-4
    )


@pytest.mark.slow
def test_wav_level_streaming_chain_matches_offline(rng):
    """Full streaming chain (StreamingStft -> StreamingComposed ->
    StreamingIstft) reproduces the offline enhancement interior for a
    causal-norm model."""
    import jax

    from eabnet_tpu.config import (
        ComposedConfig,
        EaBNetConfig,
        GaGNetConfig,
    )
    from eabnet_tpu.dsp import prepare_data, stft_to_wav
    from eabnet_tpu.models import EaBNetWithPostNet
    from eabnet_tpu.models.eabnet import to_reference_layout
    from eabnet_tpu.streaming import StreamingComposed

    cfg = StftConfig()
    mcfg = ComposedConfig(
        eabnet=EaBNetConfig(c=8, M=3, embed_dim=8, cd1=8, p=2, q=1,
                            norm_type="cLN"),
        gagnet=GaGNetConfig(c=8, cd1=8, p=1, q=1, dilas=(1, 2),
                            norm_type="cLN"),
    )
    hop = cfg.hop_samples
    n = hop * 24
    wav = (rng.standard_normal((3, n)) * 0.1).astype(np.float32)

    model = EaBNetWithPostNet(mcfg)
    feats, _ = prepare_data(jnp.asarray(wav)[None], None, cfg)
    params = model.init(jax.random.key(0), feats)["params"]

    # streaming path
    from eabnet_tpu.dsp import StreamingIstft, StreamingStft, istft

    s_stft = StreamingStft(cfg)
    s_istft = StreamingIstft(cfg)
    sm = StreamingComposed(mcfg, params)
    st_f = s_stft.init_state(1, 3)
    st_m = sm.init_state(1)
    st_i = s_istft.init_state(1)
    chunks, frames = [], []
    for t in range(n // hop):
        st_f, frame = s_stft.push(
            st_f, jnp.asarray(wav[None, :, t * hop : (t + 1) * hop])
        )
        frame = jnp.transpose(frame, (0, 2, 1, 3))  # (1, F, M, 2)
        frames.append(frame)
        st_m, o = sm.step(st_m, frame)
        st_i, samples = s_istft.push(st_i, o["esti"])
        chunks.append(np.asarray(samples)[0])
    streamed = np.concatenate(chunks, axis=-1)

    # offline model + offline iSTFT on the SAME streamed features: every
    # stage of the chain must agree exactly in the steady-state interior.
    # (Against the reflect-padded offline front-end the outputs differ
    # slightly forever: cLN's cumulative statistics keep a memory of the
    # differing lead-in frames — inherent to causal norms, not a bug.)
    same_feats = jnp.stack([f[0] for f in frames], axis=0)[None]
    out = model.apply({"params": params}, same_feats)["esti"]
    offline_wav = np.asarray(istft(out, cfg.fft_num, hop, cfg.fft_num))[0]

    # streaming sample k == offline sample k - n_fft/2 (centering trim)
    lead = cfg.fft_num // 2
    m_len = min(len(offline_wav), len(streamed) - lead) - cfg.fft_num
    a = streamed[lead : lead + m_len]
    b = offline_wav[:m_len]
    np.testing.assert_allclose(a[cfg.fft_num:], b[cfg.fft_num:], atol=2e-4)


def test_streaming_istft_matches_offline(rng):
    cfg = StftConfig()
    hop, n_fft = cfg.hop_samples, cfg.fft_num
    t_frames = 40
    spec = rng.standard_normal((1, t_frames, cfg.freq_bins, 2)).astype(
        np.float32
    )
    offline = np.asarray(istft(jnp.asarray(spec), n_fft, hop, n_fft))

    s = StreamingIstft(cfg)
    state = s.init_state(1)
    chunks = []
    for t in range(t_frames):
        state, out = s.push(state, jnp.asarray(spec[:, t]))
        chunks.append(np.asarray(out))
    streamed = np.concatenate(chunks, axis=-1)

    # streaming sample k corresponds to offline sample k - n_fft/2
    # (offline trims the centering pad); compare the steady-state interior
    lead = n_fft // 2  # samples the offline trims from the front
    m = min(offline.shape[-1], streamed.shape[-1] - lead) - n_fft
    a = streamed[:, lead : lead + m]
    b = offline[:, :m]
    np.testing.assert_allclose(a[:, n_fft:], b[:, n_fft:], atol=1e-4)
