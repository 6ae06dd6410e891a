"""The committed pretrained release model must actually enhance.

Loads the in-repo release artifact (`release/composed_9mic/*.params`, the
round-3 long-run composed model) and scores it on six items of the
committed 48-item held-out set (`release/val_set_large`) — pinning the
framework's end-to-end quality claim to artifacts that live in the
repository, so a regression in any loader/DSP/model path that would
silently corrupt released checkpoints fails CI. (The reference has no
analog: it ships no weights at all.)
"""

import glob
import os

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")
RELEASE = os.path.join(REPO, "release", "composed_9mic")
RELEASE_CLN = os.path.join(REPO, "release", "eabnet_9mic_cln")
# round-5 flagship: trained on ONLINE scene-parameter synthesis at the
# production config (pallas LSTM-BF head, batch 16 bf16) — the
# reference's default data mode (train_zc.sh:27-41)
RELEASE_ONLINE = os.path.join(REPO, "release", "eabnet_9mic_online")
VAL = os.path.join(REPO, "release", "val_set_large")
N_ITEMS = 6


@pytest.mark.slow
@pytest.mark.parametrize(
    "release,stage",
    [(RELEASE, "esti0"), (RELEASE, "esti"),
     # streaming-capable cLN artifact: both stages — the round-4
     # 50k-step recipe finished with the composed esti beating its own
     # esti0 (release/REPORT_CLN.md)
     (RELEASE_CLN, "esti0"), (RELEASE_CLN, "esti"),
     # round-5 online-trained flagship (release/REPORT_ONLINE.md)
     (RELEASE_ONLINE, "esti0"), (RELEASE_ONLINE, "esti")],
    ids=["in-esti0", "in-esti", "cln-esti0", "cln-esti",
         "online-esti0", "online-esti"],
)
def test_release_model_beats_noisy(release, stage):
    RELEASE = release
    if not glob.glob(os.path.join(RELEASE, "*.params")):
        pytest.skip("no release artifact present")
    from eabnet_tpu.data import OfflineMcseDataset
    from eabnet_tpu.eval import evaluate_dataset
    from eabnet_tpu.inference import load_enhancer

    enhancer = load_enhancer(RELEASE, output=stage)
    val = OfflineMcseDataset(VAL)

    def items(n=N_ITEMS):
        for i in range(n):
            noisy, clean = val[i]
            yield np.atleast_2d(noisy), np.asarray(clean).reshape(-1)

    enh, _ = evaluate_dataset(enhancer, items(), sr=16000)
    base, _ = evaluate_dataset(lambda n: n[0], items(), sr=16000)

    # margins set at roughly half the measured step-26000 means
    # (si_sdr +16 dB, stoi +0.18, estoi +0.25 over noisy on the full set)
    assert enh.mean_std("si_sdr")[0] > base.mean_std("si_sdr")[0] + 8.0
    assert enh.mean_std("stoi")[0] > base.mean_std("stoi")[0] + 0.08
    assert enh.mean_std("estoi")[0] > base.mean_std("estoi")[0] + 0.10
    assert enh.mean_std("pesq")[0] > base.mean_std("pesq")[0] + 0.3


@pytest.mark.slow
def test_cln_composed_margin_over_own_beamformer():
    """The flagship claim itself, CI-asserted: the cLN composed model's
    post-filtered output (esti) beats its OWN beamformer stage (esti0) on
    half the committed held-out set — at half the measured margins
    (release/REPORT_CLN.md: +2.52 dB SI-SDR, +0.047 ESTOI on all 48
    items). Beating *noisy* alone (the test above) would not catch a
    regression that collapses the post-filter win to zero.

    Scored through Enhancer.enhance_batch on the virtual 8-device mesh —
    one compiled program per stage instead of one forward per item, and
    a second live pin of the batched serving path on the real artifact.
    Reference contract: EaBNet.py:127-155 (the composed model's esti
    refines esti0)."""
    if not glob.glob(os.path.join(RELEASE_CLN, "*.params")):
        pytest.skip("no cLN release artifact present")
    from eabnet_tpu.data import OfflineMcseDataset
    from eabnet_tpu.eval.metrics import si_sdr
    from eabnet_tpu.eval.stoi import stoi
    from eabnet_tpu.inference import load_enhancer
    from eabnet_tpu.parallel import make_mesh

    val = OfflineMcseDataset(VAL)
    n = 24
    assert len(val) >= n
    pairs = [val[i] for i in range(n)]
    wavs = [np.atleast_2d(noisy) for noisy, _ in pairs]
    cleans = [np.asarray(clean).reshape(-1) for _, clean in pairs]

    mesh = make_mesh()
    margins = {}
    for stage in ("esti0", "esti"):
        enhancer = load_enhancer(RELEASE_CLN, output=stage, mesh=mesh)
        outs = enhancer.enhance_batch(wavs)
        margins[stage] = {
            "si_sdr": np.mean([si_sdr(c, o)
                               for o, c in zip(outs, cleans)]),
            "estoi": np.mean([stoi(c, o, 16000, extended=True)
                              for o, c in zip(outs, cleans)]),
        }
    d_sdr = margins["esti"]["si_sdr"] - margins["esti0"]["si_sdr"]
    d_estoi = margins["esti"]["estoi"] - margins["esti0"]["estoi"]
    assert d_sdr >= 1.5, (margins, d_sdr)
    assert d_estoi >= 0.02, (margins, d_estoi)
