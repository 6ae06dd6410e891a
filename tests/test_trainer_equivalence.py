"""Step-wise trainer equivalence against the reference torch stack.

Forward parity (1e-6) and loss parity (1e-6) were already pinned
(test_parity_composed.py); this test pins the remaining link — the
*optimizer semantics* — by running the two full training loops side by
side from one converted init on identical batches and requiring the loss
trajectories to track.

Optimizer crosswalk (reference: train_distributed.py:185, 221-230):

  torch                                   this framework (train/step.py)
  ------------------------------------    ------------------------------
  loss['final'].backward()                jax.value_and_grad on final
  clip_grad_norm_(params, 1.0)            optax.clip_by_global_norm(1.0)
    (global L2 norm, scale if > max)        (same definition)
  torch.optim.Adam(lr=5e-4)               optax.adam(5e-4)
    betas (0.9, 0.999), eps 1e-8,           b1/b2/eps identical,
    eps INSIDE denom after sqrt(v_hat),     eps_root=0 => same placement
    bias-corrected m_hat/v_hat              bias correction identical
  order: clip THEN step                   chain(clip, adam): same order
  loss mask: all-ones (full frames)       frame_mask == all-ones here

Any silent divergence in clip ordering, epsilon convention, or mask
semantics compounds exponentially over steps — 100 steps at lr 5e-4 is a
sensitive detector (measured drift of the correct pairing stays in the
1e-3 relative range; a wrong eps placement blows past 10% within tens of
steps).

Online-path note (round 5): the fused device-mix train steps
(batch_kind="parts"/"scene", train/step.py) reuse this exact optimizer
chain unchanged — synthesis happens before the differentiated function,
and online items are full-clip length by construction
(load_and_crop pads/crops to clip_seconds), so the loss frame masks are
all-ones exactly as in the crosswalk row above. No optimizer-semantics
interaction is introduced by the online data mode.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF),
                       reason="reference repo not mounted"),
]

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from eabnet_tpu.config import (  # noqa: E402
    ComposedConfig,
    DataConfig,
    EaBNetConfig,
    ExperimentConfig,
    GaGNetConfig,
    TrainConfig,
)
from eabnet_tpu.train.step import (  # noqa: E402
    create_train_state,
    make_train_step,
)
from eabnet_tpu.utils.convert_torch import convert_composed  # noqa: E402

N_STEPS = 100
BATCH = 2
SECONDS = 1.0
SR = 16000
LR = 5e-4


def small_cfg():
    return ComposedConfig(
        eabnet=EaBNetConfig(M=3, c=16, embed_dim=16, cd1=16, p=2, q=2),
        gagnet=GaGNetConfig(c=16, cd1=16, p=1, q=1, dilas=(1, 2)),
    )


def _ref_args(cfg: ComposedConfig):
    e, g = cfg.eabnet, cfg.gagnet
    return types.SimpleNamespace(
        k1=e.k1, k2=e.k2, c=e.c, M=e.M, embed_dim=e.embed_dim, kd1=e.kd1,
        cd1=e.cd1, d_feat=e.d_feat, p=e.p, q=e.q, is_causal=e.is_causal,
        is_u2=e.is_u2, bf_type=e.bf_type, topo_type=e.topo_type,
        intra_connect=e.intra_connect, norm_type=e.norm_type,
        ref_mic=cfg.ref_mic, freeze_eabnet=cfg.freeze_eabnet,
        gagnet_k1=g.k1, gagnet_k2=g.k2, gagnet_c=g.c, gagnet_kd1=g.kd1,
        gagnet_cd1=g.cd1, gagnet_d_feat=g.d_feat, gagnet_p=g.p,
        gagnet_q=g.q, gagnet_dilas=list(g.dilas),
        gagnet_fft_num=g.fft_num, gagnet_is_u2=g.is_u2,
        gagnet_is_causal=g.is_causal, gagnet_is_squeezed=g.is_squeezed,
        gagnet_acti_type=g.acti_type,
        gagnet_intra_connect=g.intra_connect,
        gagnet_norm_type=g.norm_type,
    )


def make_batches(n_steps, seed=7):
    """Identical waveform batches for both stacks: speech-scale noise
    mixtures so losses start in the realistic range."""
    rng = np.random.default_rng(seed)
    n = int(SECONDS * SR)
    batches = []
    for _ in range(n_steps):
        clean = (rng.normal(size=(BATCH, n)) * 0.05).astype(np.float32)
        noise = (rng.normal(size=(BATCH, 3, n)) * 0.03).astype(np.float32)
        noisy = clean[:, None, :] + noise
        batches.append((noisy, clean))
    return batches


def _stub_missing_modules():
    """train_distributed.py imports GPU-era deps absent from this image
    (torchvision, soundfile, librosa, ...); none are touched by
    prepare_data, so empty stubs suffice."""
    import importlib.machinery
    import importlib.util
    import types as _types

    names = ("torchvision", "torchvision.transforms", "soundfile",
             "librosa", "torchaudio", "pyroomacoustics", "resampy",
             "pesq", "pystoi")
    roots = {n.split(".")[0] for n in names}
    missing = {r for r in roots
               if r not in sys.modules
               and importlib.util.find_spec(r) is None}
    for name in names:
        if name.split(".")[0] in missing and name not in sys.modules:
            mod = _types.ModuleType(name)
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
            sys.modules[name] = mod
            if "." in name:
                parent, child = name.rsplit(".", 1)
                setattr(sys.modules[parent], child, mod)
    # metric shims (never called in this test; imported at module scope
    # by the reference's test.py which train_distributed.py pulls in)
    if "pesq" in missing:
        from eabnet_tpu.eval.pesq import pesq as fp_pesq

        sys.modules["pesq"].pesq = fp_pesq
    if "pystoi" in missing:
        from eabnet_tpu.eval.stoi import stoi as fp_stoi

        sys.modules["pystoi"].stoi = fp_stoi
    if "soundfile" in missing:
        sys.modules["soundfile"].read = None


def torch_trajectory(cfg, batches):
    """The reference loop verbatim: prepare_data -> forward -> stagewise
    loss -> backward -> clip_grad_norm_(1.0) -> Adam(5e-4).step()
    (reference: train_distributed.py:185, 218-230)."""
    _stub_missing_modules()
    import EaBNet as ref_mod
    import train_distributed as ref_train

    saved = (torch.Tensor.cuda, torch.nn.Module.cuda)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    try:
        torch.manual_seed(0)
        net = ref_mod.make_eabnet_with_postnet(_ref_args(cfg))
        sd = {k: v.detach().clone() for k, v in net.state_dict().items()}
        net.train()
        opt = torch.optim.Adam(net.parameters(), lr=LR)
        args = types.SimpleNamespace(
            mics=cfg.eabnet.M, sr=SR, wav_len=SECONDS, win_size=0.02,
            win_shift=0.01, fft_num=320,
        )
        device = torch.device("cpu")
        losses = []
        for noisy, clean in batches:
            opt.zero_grad()
            noisy_stft, target_stft = ref_train.prepare_data(
                torch.from_numpy(noisy), torch.from_numpy(clean),
                device, args,
            )
            out = net(noisy_stft)
            frame_list = [noisy_stft.shape[1]] * BATCH
            l = ref_mod.eabnet_with_postnet_loss(
                out, target_stft, frame_list
            )
            l["final"].backward()
            torch.nn.utils.clip_grad_norm_(net.parameters(), 1.0)
            opt.step()
            losses.append(float(l["final"].item()))
        return sd, np.asarray(losses)
    finally:
        torch.Tensor.cuda, torch.nn.Module.cuda = saved


def jax_trajectory(cfg, sd, batches, tmpdir):
    exp = ExperimentConfig(
        model=cfg,
        data=DataConfig(dataset="fake", clip_seconds=SECONDS,
                        num_workers=0),
        train=TrainConfig(
            batch_size=BATCH, wav_len=SECONDS, total_epoch=1, lr=LR,
            grad_clip=1.0, compute_dtype="float32",
            checkpoint_dir=str(tmpdir), exp_root=str(tmpdir),
        ),
    )
    model, state = create_train_state(exp, jax.random.key(0))
    params = convert_composed(sd, cfg)
    state = state.replace(params=jax.tree.map(jnp.asarray, params))
    step = make_train_step(exp, model, donate=False)
    losses = []
    for noisy, clean in batches:
        state, l = step(state, jnp.asarray(noisy), jnp.asarray(clean))
        losses.append(float(l["final"]))
    return np.asarray(losses)


def test_loss_trajectories_track(tmp_path):
    cfg = small_cfg()
    batches = make_batches(N_STEPS)
    sd, ref_losses = torch_trajectory(cfg, batches)
    our_losses = jax_trajectory(cfg, sd, batches, tmp_path)

    rel = np.abs(ref_losses - our_losses) / np.abs(ref_losses)
    # step 1 is pure forward+loss parity from the converted init
    assert rel[0] < 1e-4, (ref_losses[0], our_losses[0])
    # early trajectory: one optimizer application each
    assert rel[:10].max() < 5e-3, rel[:10]
    # f32 round-off compounds through 100 updates; anything semantic
    # (clip order, eps placement, mask) blows past these immediately
    assert rel.mean() < 0.02, rel.mean()
    assert rel.max() < 0.10, (rel.argmax(), rel.max())
    # both trained: loss actually went somewhere (same direction)
    assert our_losses[-10:].mean() < our_losses[:10].mean()
    assert np.sign(our_losses[-1] - our_losses[0]) == np.sign(
        ref_losses[-1] - ref_losses[0]
    )
