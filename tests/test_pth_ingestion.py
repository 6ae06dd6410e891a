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
