"""CI pin of the full-loop reference-stack evaluation path
(tools/reference_stack_eval.py).

release/REFERENCE_STACK_EVAL.md certifies the shipped artifacts through
the reference's OWN eval loop (reference: test.py:126-212) — but a
one-shot report can silently rot as the exporter, the stub modules, or
either metric battery evolve. This test re-runs the whole certification
machinery end-to-end on a tiny config and a freshly synthesized 2-item
val set: export a random-init composed model to .pth, score esti0
through the reference's untouched ``test.test()`` and esti through the
reference's ``EaBNetWithPostNet`` loop, score the same items through
this framework's harness in reference-emulation mode
(``decompress_output=False``), and assert per-item agreement on all
seven metrics.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF),
                       reason="reference repo not mounted"),
]

KEYS = ("pesq", "nb_pesq", "stoi", "estoi", "si_sdr", "si_sir", "si_sar")


def _load_ref_test_module():
    """Load /root/reference/test.py under a non-colliding module name
    (plain ``import test`` would race the stdlib ``test`` package and
    pytest's own module graph)."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    spec = importlib.util.spec_from_file_location(
        "ref_test_mod", os.path.join(REF, "test.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture
def stubbed_reference(monkeypatch):
    """Install the tool's stand-in modules for packages absent in this
    image, restoring sys.modules afterwards so the stubs cannot leak
    into other tests (e.g. backend auto-detection in eval/pesq.py)."""
    from tools import reference_stack_eval as rse

    before = set(sys.modules)
    monkeypatch.setenv("EABNET_PESQ_BACKEND", "first_party")
    subbed = rse._install_stub_modules()
    ref_test = _load_ref_test_module()
    yield rse, ref_test, subbed
    for name in set(sys.modules) - before:
        if name in subbed or name == "ref_test_mod":
            sys.modules.pop(name, None)


def _tiny_exp_root(tmp_path):
    import jax

    from eabnet_tpu.config import (ComposedConfig, EaBNetConfig,
                                   ExperimentConfig, GaGNetConfig)
    from eabnet_tpu.train.checkpoint import save_config, save_params
    from eabnet_tpu.train.step import create_train_state

    cfg = ExperimentConfig(model=ComposedConfig(
        eabnet=EaBNetConfig(M=3, c=16, embed_dim=16, cd1=16, p=2, q=2),
        gagnet=GaGNetConfig(c=16, cd1=16, p=1, q=1, dilas=(1, 2)),
    ))
    exp_root = str(tmp_path / "exp")
    os.makedirs(exp_root)
    _, state = create_train_state(cfg, jax.random.key(7))
    save_config(cfg, exp_root)
    save_params(state.params, exp_root, 10)
    return cfg, state.params, exp_root


def _tiny_val_set(tmp_path, n_items=2, seconds=2.0, mics=3, sr=16000):
    from scipy.io import wavfile

    from eabnet_tpu.data.synth_speech import synth_utterance

    val = tmp_path / "val"
    for sub in ("clean", "noisy"):
        (val / sub).mkdir(parents=True)
    rng = np.random.default_rng(42)
    n = int(seconds * sr)
    for i in range(n_items):
        clean = synth_utterance(seconds, sr, rng)[:n]
        clean = 0.2 * clean / (np.max(np.abs(clean)) + 1e-9)
        noise = 0.02 * rng.standard_normal((mics, n))
        noisy = clean[None, :] + noise
        to16 = lambda x: np.clip(x * 32768.0, -32768, 32767).astype(
            np.int16)
        wavfile.write(str(val / "clean" / f"{i:05d}.wav"), sr, to16(clean))
        wavfile.write(str(val / "noisy" / f"{i:05d}.wav"), sr,
                      to16(noisy).T)
    return str(val)


def test_reference_stack_eval_tiny_end_to_end(tmp_path,
                                              stubbed_reference):
    import dataclasses
    import tempfile

    rse, ref_test, subbed = stubbed_reference
    # the C-backed packages really are absent here, so the stub set must
    # cover the metric backends the reference imports
    assert {"pesq", "pystoi"} <= set(subbed) | set(sys.modules)

    cfg, params, exp_root = _tiny_exp_root(tmp_path)
    val = _tiny_val_set(tmp_path)

    with tempfile.TemporaryDirectory() as td:
        composed_pth, bare_pth = rse._export_pths(exp_root, REF, td)
        ns = rse._make_args(cfg, val)
        ref_esti0 = rse.run_reference_bare(ref_test, ns, bare_pth, val)
        ref_esti = rse.run_reference_composed(ref_test, ns,
                                              composed_pth, val)

    cfg_emul = dataclasses.replace(
        cfg, stft=dataclasses.replace(cfg.stft, decompress_output=False))
    ours_esti0 = rse.run_our_harness(cfg_emul, params, val, "esti0")
    ours_esti = rse.run_our_harness(cfg_emul, params, val, "esti")

    assert len(ref_esti0) == len(ours_esti0) == 2
    for ref_rows, our_rows, stage in ((ref_esti0, ours_esti0, "esti0"),
                                      (ref_esti, ours_esti, "esti")):
        for i, (r, o) in enumerate(zip(ref_rows, our_rows)):
            for k in KEYS:
                assert abs(float(r[k]) - float(o[k])) < 1e-3, (
                    f"{stage} item {i} metric {k}: reference stack "
                    f"{r[k]} vs our harness {o[k]}")
