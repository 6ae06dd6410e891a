"""Live cross-check of the metric library against the reference's own
``metrics.py`` (imported from /root/reference, read-only).

The other metric tests pin our implementations to the published formulas;
this one pins them to the exact code the reference scores with
(reference: metrics.py:14-46, 71-81), so any divergence in the SI-SDR
decomposition, SNR, or confidence-interval math is caught directly.
``pesq``/``pystoi`` are stubbed only to satisfy the reference module's
top-level imports (metrics.py:10-11) — no stubbed function is called.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_metrics():
    if not os.path.exists(os.path.join(REF, "metrics.py")):
        pytest.skip("reference tree not present")
    added = []
    for name in ("pesq", "pystoi"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            setattr(mod, name.replace("pystoi", "stoi"), None)
            sys.modules[name] = mod
            added.append(name)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_metrics", os.path.join(REF, "metrics.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        for name in added:
            sys.modules.pop(name, None)


def test_energy_ratios_match_reference(ref_metrics, rng):
    from eabnet_tpu.eval import energy_ratios

    for _ in range(5):
        s = rng.standard_normal(16000)
        n = rng.standard_normal(16000)
        s_hat = s + rng.uniform(0.05, 0.8) * n \
            + 0.02 * rng.standard_normal(16000)
        ours = energy_ratios(s_hat, s, n)
        theirs = ref_metrics.energy_ratios(s_hat, s, n)
        np.testing.assert_allclose(ours, theirs, rtol=1e-10)


def test_si_sdr_matches_reference(ref_metrics, rng):
    from eabnet_tpu.eval import si_sdr

    s = rng.standard_normal(16000)
    for scale in (1.0, 0.3, 7.0):
        est = scale * (s + 0.2 * rng.standard_normal(16000))
        np.testing.assert_allclose(
            si_sdr(s, est), ref_metrics.si_sdr(s, est), rtol=1e-10
        )


def test_snr_matches_reference(ref_metrics, rng):
    from eabnet_tpu.eval import snr_db

    s = rng.standard_normal(8000)
    n = 0.1 * rng.standard_normal(8000)
    np.testing.assert_allclose(
        snr_db(s, n), ref_metrics.snr_dB(s, n), rtol=1e-10
    )


def test_conf_int_matches_reference(ref_metrics, rng):
    from eabnet_tpu.eval.metrics import mean_conf_int

    data = rng.standard_normal(37) * 3 + 1.5
    m_ref, h_ref = ref_metrics.mean_conf_int(data)
    m, h = mean_conf_int(data)
    np.testing.assert_allclose([m, h], [m_ref, h_ref], rtol=1e-10)
