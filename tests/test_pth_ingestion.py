"""End-to-end ingestion of reference-format torch checkpoints (.pth).

Builds a reference-shaped checkpoint file from the committed golden
state_dicts (no reference code needed) and verifies the auto-resume path
and the enhancement API consume it."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from eabnet_tpu.config import (  # noqa: E402
    ComposedConfig,
    EaBNetConfig,
    ExperimentConfig,
    GaGNetConfig,
)
from eabnet_tpu.train.checkpoint import (  # noqa: E402
    latest_checkpoint,
    load_checkpoint,
)
from eabnet_tpu.train.step import create_train_state  # noqa: E402

from tests.test_golden import _load  # noqa: E402


@pytest.fixture(scope="module")
def cfg():
    return ExperimentConfig(
        model=ComposedConfig(
            eabnet=EaBNetConfig(c=16, M=3, embed_dim=16, cd1=16, p=2, q=2),
            gagnet=GaGNetConfig(c=16, cd1=16, p=1, q=2),
        )
    )


@pytest.fixture(scope="module")
def pth_path(tmp_path_factory, cfg):
    eab_sd, _ = _load("eabnet_small")
    gag_sd, _ = _load("gagnet_small")
    sd = {}
    for k, v in eab_sd.items():
        sd[f"module.eabnet.{k}"] = torch.from_numpy(v)  # DDP prefix too
    for k, v in gag_sd.items():
        sd[f"module.postnet.{k}"] = torch.from_numpy(v)
    d = tmp_path_factory.mktemp("ckpts")
    path = d / "4217.pth"
    torch.save(
        {"model_state_dict": sd, "iteration": 4217, "epoch": 3}, str(path)
    )
    return str(path), str(d)


def test_latest_checkpoint_finds_pth(pth_path):
    path, d = pth_path
    assert latest_checkpoint(d) == path


@pytest.mark.slow
def test_reference_experiment_dir_end_to_end(pth_path, cfg, tmp_path):
    """A reference experiment dir (args.pickle + <iter>.pth) enhances a
    wav through load_enhancer with zero conversion steps."""
    import argparse
    import pickle
    import shutil

    path, _ = pth_path
    exp = tmp_path / "ref_exp"
    exp.mkdir()
    shutil.copy(path, exp / "4217.pth")
    e, g = cfg.model.eabnet, cfg.model.gagnet
    ns = argparse.Namespace(
        batch_size=6, mics=3, M=3, sr=16000, wav_len=6.0, win_size=0.020,
        win_shift=0.010, fft_num=320, k1=(2, 3), k2=(1, 3), c=e.c,
        embed_dim=e.embed_dim, kd1=e.kd1, cd1=e.cd1, d_feat=e.d_feat,
        p=e.p, q=e.q, is_causal=True, is_u2=True, bf_type="lstm",
        topo_type="mimo", intra_connect="cat", norm_type="IN",
        ref_mic=0, freeze_eabnet=False,
        gagnet_fft_num=320, gagnet_k1=(2, 3), gagnet_k2=(1, 3),
        gagnet_c=g.c, gagnet_kd1=g.kd1, gagnet_cd1=g.cd1,
        gagnet_d_feat=g.d_feat, gagnet_p=g.p, gagnet_q=g.q,
        gagnet_dilas=[1, 2, 5, 9], gagnet_is_u2=True,
        gagnet_is_causal=True, gagnet_is_squeezed=False,
        gagnet_acti_type="sigmoid", gagnet_intra_connect="cat",
        gagnet_norm_type="IN", dataset="mcse",
        checkpoint_dir=str(exp), exp_root=str(exp),
    )
    with open(exp / "args.pickle", "wb") as f:
        pickle.dump(ns, f)

    from eabnet_tpu.inference import load_enhancer

    enhancer = load_enhancer(str(exp))
    assert enhancer.cfg.model.eabnet.c == e.c
    assert enhancer.cfg.model.gagnet.q == g.q
    rng = np.random.default_rng(1)
    out = enhancer((rng.standard_normal((3, 3200)) * 0.1).astype(np.float32))
    assert out.shape == (3200,)
    assert np.isfinite(out).all()


@pytest.mark.slow
def test_load_and_enhance_from_pth(pth_path, cfg):
    path, _ = pth_path
    _, state = create_train_state(cfg, jax.random.key(0))
    state, epoch = load_checkpoint(path, state, cfg)
    assert epoch == 3
    assert int(state.step) == 4217

    from eabnet_tpu.inference import Enhancer

    enhancer = Enhancer(cfg, state.params)
    rng = np.random.default_rng(0)
    noisy = (rng.standard_normal((3, 4800)) * 0.1).astype(np.float32)
    out = enhancer(noisy, mic_permutation=[2, 0, 1])
    assert out.shape == (4800,)
    assert np.isfinite(out).all()
