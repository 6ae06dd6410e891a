"""Full-loop evaluation of exported checkpoints through the REFERENCE's
own torch eval stack (reference: test.py:126-212).

The parity story so far rests on our code: forward parity
(tests/test_parity_reference.py), loss parity, bidirectional checkpoint
interop (tests/test_convert_reverse.py), and live metric-function parity
(tests/test_metrics_reference_live.py). What this tool adds is the one
artifact those tests don't produce: the reference's *own* evaluation path
— its ``prepare_data`` (test.py:20-47), its ``EaBNet``/``EaBNetWithPostNet``
forward, its ``torch.istft`` (test.py:189-190), its ``cal_single_metrics``
(test.py:126-153), its ``McseDatasetOffline`` loader
(dataset/mcse_dataset.py:292-309) — run end-to-end over the committed
frozen val set on a ``.pth`` exported by tools/export_reference_pth.py,
side by side with this framework's harness scores on the identical items.

Environment substitutions (this image has no pesq/pystoi/resampy/
soundfile/torchaudio/pyroomacoustics packages): the C-backed metric
packages are replaced by in-process stub modules that delegate to the
first-party implementations with identical call signatures
(eabnet_tpu/eval/pesq.py docstring records the quantified P.862 deviation
bounds), and ``torchaudio.load`` is backed by scipy wavfile with the same
int16 -> [-1, 1) float semantics. Every substitution is recorded in the
emitted report. All *logic* in the scoring loop — STFT, network, iSTFT,
alignment, SI-SDR decomposition — is the reference's code, imported from
/root/reference and executed live.

Two passes per val set:
  - ``bare``: the reference's own ``test.test(args)`` untouched, on a
    bare-EaBNet state_dict (the ``eabnet.``-prefixed slice of the
    composed export; key coverage asserted exact, so its strict=False
    load is vacuously strict) — scores esti0 through the reference stack.
  - ``composed``: the reference's ``EaBNetWithPostNet`` loaded
    strict=True from the full export, driven by the same reference
    ``prepare_data``/``istft``/``cal_single_metrics`` — scores esti.

Usage:
    python tools/reference_stack_eval.py \
        --exp-root release/composed_9mic --val-set release/val_set_large \
        --out release/REFERENCE_STACK_EVAL.md
"""

import argparse
import contextlib
import json
import os
import sys
import tempfile
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _install_stub_modules():
    """Pre-register stand-ins for packages absent in this image, BEFORE
    /root/reference modules import them. Signatures match the real
    packages; metric stubs delegate to the first-party backends."""
    from eabnet_tpu.eval.p862 import pesq_p862
    from eabnet_tpu.eval.stoi import stoi as fp_stoi

    # the stub must delegate to the p862 implementation DIRECTLY (not the
    # eval.pesq dispatcher — the dispatcher would discover this very stub
    # as an installed `pesq` package and recurse); pin the backend env so
    # our-harness passes use the identical implementation
    os.environ["EABNET_PESQ_BACKEND"] = "first_party"

    stubs = {}

    m = types.ModuleType("pesq")
    m.pesq = pesq_p862  # pesq(sr, ref, deg, mode) — same signature
    stubs["pesq"] = m

    m = types.ModuleType("pystoi")
    m.stoi = fp_stoi  # stoi(clean, den, fs, extended=) — same signature
    stubs["pystoi"] = m

    m = types.ModuleType("resampy")

    def _resample(x, sr_orig, sr_new, **kw):
        from math import gcd

        from scipy.signal import resample_poly

        g = gcd(int(sr_orig), int(sr_new))
        return resample_poly(x, int(sr_new) // g, int(sr_orig) // g)

    m.resample = _resample
    stubs["resampy"] = m

    m = types.ModuleType("soundfile")

    def _sf_read(path, **kw):
        from scipy.io import wavfile

        sr, data = wavfile.read(path)
        if data.dtype == np.int16:
            data = data.astype(np.float32) / 32768.0
        return data, sr

    m.read = _sf_read
    stubs["soundfile"] = m

    m = types.ModuleType("torchaudio")

    def _ta_load(path, **kw):
        import torch
        from scipy.io import wavfile

        sr, data = wavfile.read(path)
        if data.dtype == np.int16:
            data = data.astype(np.float32) / 32768.0
        data = np.atleast_2d(np.asarray(data, np.float32))
        if data.shape[0] > data.shape[1]:  # (N, C) -> (C, N)
            data = data.T
        return torch.from_numpy(data.copy()), sr

    m.load = _ta_load
    stubs["torchaudio"] = m

    # imported at module level by dataset/mcse_dataset.py but only used
    # for online synthesis, which this tool never exercises
    stubs["pyroomacoustics"] = types.ModuleType("pyroomacoustics")

    subbed = []
    for name, mod in stubs.items():
        if name in ("pesq", "pystoi"):
            # ALWAYS substitute the metric backends, even where the real
            # C packages are importable: the agreement columns compare
            # the two STACKS, so both must score with one implementation
            # (our harness is pinned to first_party above — a real pesq
            # on the reference side would fold P.862-conformance deltas
            # into the stack-parity numbers).
            sys.modules[name] = mod
            subbed.append(name)
            continue
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                sys.modules[name] = mod
                subbed.append(name)
    return subbed


@contextlib.contextmanager
def _cpu_torch_device():
    """The reference hardcodes cuda:0 (test.py:158); run it on CPU torch
    by making torch.device resolve to cpu for the duration."""
    import torch

    real = torch.device
    torch.device = lambda *a, **k: real("cpu")
    try:
        yield
    finally:
        torch.device = real


def _export_pths(exp_root, reference_root, tmpdir):
    """Composed + bare-EaBNet .pth from the release artifact."""
    import torch

    from tools.export_reference_pth import main as export_main

    composed_pth = os.path.join(tmpdir, "composed.pth")
    export_main(["--exp-root", exp_root, "--reference-root",
                 reference_root, "--out", composed_pth])
    ck = torch.load(composed_pth, map_location="cpu")
    sd = ck["model_state_dict"]
    bare = {k[len("eabnet."):]: v for k, v in sd.items()
            if k.startswith("eabnet.")}
    bare_pth = os.path.join(tmpdir, "bare.pth")
    torch.save({"model_state_dict": bare,
                "iteration": ck.get("iteration", 0),
                "epoch": ck.get("epoch", 0)}, bare_pth)
    return composed_pth, bare_pth


def _make_args(cfg, val_set):
    from eabnet_tpu.utils.convert_args import reference_args_from_config

    ns = reference_args_from_config(cfg.model)
    ns.mics = cfg.model.eabnet.M
    ns.sr = cfg.stft.sr
    ns.fft_num = cfg.stft.fft_num
    ns.win_size = cfg.stft.win_size
    ns.win_shift = cfg.stft.win_shift
    ns.wav_len = 6.0
    ns.dataset = "mcse"
    ns.mcse_dataset_train_set = "offline"
    ns.mcse_dataset_val_set = os.path.abspath(val_set)
    ns.freeze_eabnet = False
    return ns


@contextlib.contextmanager
def _offline_train_dirs(val_set):
    """make_mcse_dataset('offline') constructs the (unused) train split
    from hardcoded relative dirs (dataset/mcse_dataset.py:323-326);
    satisfy the os.listdir in its ctor with symlinks to the val set."""
    cwd = os.getcwd()
    with tempfile.TemporaryDirectory() as td:
        root = os.path.join(td, "data", "datasets", "mcse_train")
        os.makedirs(root)
        os.symlink(os.path.abspath(os.path.join(val_set, "clean")),
                   os.path.join(root, "clean"))
        os.symlink(os.path.abspath(os.path.join(val_set, "noisy")),
                   os.path.join(root, "noisy"))
        os.chdir(td)
        try:
            yield
        finally:
            os.chdir(cwd)


def run_reference_bare(ref_test, args_ns, bare_pth, val_set):
    """The reference's own test.test(args), untouched, recording the
    per-item rows its cal_single_metrics produces."""
    import torch

    # assert the bare export covers the reference net's keys exactly, so
    # test()'s strict=False load (test.py:165) is vacuously strict
    from EaBNet import EaBNet

    net = EaBNet(k1=args_ns.k1, k2=args_ns.k2, c=args_ns.c, M=args_ns.M,
                 embed_dim=args_ns.embed_dim, kd1=args_ns.kd1,
                 cd1=args_ns.cd1, d_feat=args_ns.d_feat, p=args_ns.p,
                 q=args_ns.q, is_causal=args_ns.is_causal,
                 is_u2=args_ns.is_u2, bf_type=args_ns.bf_type,
                 topo_type=args_ns.topo_type,
                 intra_connect=args_ns.intra_connect,
                 norm_type=args_ns.norm_type)
    sd = torch.load(bare_pth, map_location="cpu")["model_state_dict"]
    want = set(net.state_dict().keys())
    have = set(sd.keys())
    assert want == have, (
        f"bare export key mismatch: missing {sorted(want - have)[:5]}, "
        f"unexpected {sorted(have - want)[:5]}")

    rows = []
    orig = ref_test.cal_single_metrics

    def recording(gt, y, x_method, sr=16000):
        ret = orig(gt, y, x_method, sr)
        rows.append(dict(ret))
        return ret

    ref_test.cal_single_metrics = recording
    args_ns.model_path = bare_pth
    try:
        with _cpu_torch_device(), _offline_train_dirs(val_set):
            ref_test.test(args_ns)
    finally:
        ref_test.cal_single_metrics = orig
    return rows


def run_reference_composed(ref_test, args_ns, composed_pth, val_set):
    """esti through the reference stack: reference EaBNetWithPostNet
    (EaBNet.py:127-155) loaded strict=True, driven by the reference's
    prepare_data / torch.istft / cal_single_metrics in the same loop
    shape as test.test (test.py:175-199)."""
    import torch

    from EaBNet import EaBNetWithPostNet

    with _cpu_torch_device(), _offline_train_dirs(val_set):
        device = torch.device("cpu")
        net = EaBNetWithPostNet(args_ns).to(device)
        ck = torch.load(composed_pth, map_location="cpu")
        net.load_state_dict(ck["model_state_dict"], strict=True)
        net.eval()

        from dataset import make_dataset

        _, val_dataset = make_dataset(args_ns)
        import torch.utils.data as utils

        valloader = utils.DataLoader(val_dataset, 1, shuffle=False)
        sr = args_ns.sr
        win_size = int(args_ns.win_size * sr)
        win_shift = int(args_ns.win_shift * sr)
        fft_num = args_ns.fft_num
        rows = []
        with torch.no_grad():
            for x, target in valloader:
                noisy_stft, target_stft = ref_test.prepare_data(
                    x, target, device, args_ns)
                esti_stft = net(noisy_stft)["esti_stft"]
                esti_stft = esti_stft.permute(0, 3, 2, 1)
                esti_wav = torch.istft(
                    torch.view_as_complex(esti_stft.contiguous()),
                    fft_num, win_shift, win_size,
                    torch.hann_window(win_size).to(device))
                ret = ref_test.cal_single_metrics(
                    target.squeeze(0).cpu().numpy()[0],
                    x.squeeze(0).cpu().numpy()[0],
                    esti_wav.cpu().numpy()[0], sr)
                rows.append(dict(ret))
        return rows


def run_our_harness(cfg, params, val_set, output):
    """Same items through this framework's Enhancer + metric battery."""
    from eabnet_tpu.data.datasets import OfflineMcseDataset
    from eabnet_tpu.eval import evaluate_dataset
    from eabnet_tpu.inference import Enhancer

    ds = OfflineMcseDataset(val_set)

    def items():
        for i in range(len(ds)):
            noisy, clean = ds[i]
            yield np.atleast_2d(noisy), np.asarray(clean).reshape(-1)

    # pad_mode="reference": featurize items exactly as the reference's
    # eval loop does (no appended zero tail), so per-item agreement is
    # bounded by arithmetic, not by padding semantics — the val items
    # are whole-second so the solo path adds no padding at all
    acc, rows = evaluate_dataset(
        Enhancer(cfg, params, output=output, pad_mode="reference"),
        items(), sr=cfg.stft.sr)
    return rows


def _summarize(rows, keys):
    out = {}
    for k in keys:
        vals = np.asarray([r[k] for r in rows], float)
        ci = (0.0 if len(vals) < 2 else
              float(1.96 * vals.std(ddof=1) / np.sqrt(len(vals))))
        out[k] = (float(vals.mean()), ci)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp-root", default="release/composed_9mic")
    ap.add_argument("--val-set", default="release/val_set_large")
    ap.add_argument("--reference-root", default="/root/reference")
    ap.add_argument("--out", default="release/REFERENCE_STACK_EVAL.md")
    ap.add_argument("--csv-prefix", default=None,
                    help="also write per-item CSVs to <prefix>_<pass>.csv")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    subbed = _install_stub_modules()
    print(f"[refeval] stubbed packages: {subbed}", flush=True)
    sys.path.insert(0, args.reference_root)

    from eabnet_tpu.config import ExperimentConfig
    from eabnet_tpu.eval.pesq import pesq_backend
    from eabnet_tpu.train.checkpoint import (latest_checkpoint,
                                             load_checkpoint)
    from eabnet_tpu.train.step import create_train_state

    cfg = ExperimentConfig.load(os.path.join(args.exp_root, "config.json"))
    # same resolution order as export_reference_pth: training experiment
    # dirs keep checkpoints under <exp_root>/ckpt/, release artifacts at
    # the top level
    ckpt = (latest_checkpoint(os.path.join(args.exp_root, "ckpt"))
            or latest_checkpoint(args.exp_root))
    if ckpt is None:
        raise FileNotFoundError(f"no checkpoint under {args.exp_root}")
    print(f"[refeval] artifact {ckpt}", flush=True)

    import test as ref_test  # /root/reference/test.py

    keys = ("pesq", "nb_pesq", "stoi", "estoi", "si_sdr", "si_sir",
            "si_sar")
    import contextlib

    from eabnet_tpu.utils.reference_compat import (
        _needs_cln_patch, patch_reference_cln,
    )

    # cumulative-norm artifacts need the reference's NormSwitch repaired
    # (utils/reference_compat.py) for its nets to construct at all
    shim = (patch_reference_cln() if _needs_cln_patch(cfg.model)
            else contextlib.nullcontext())
    results = {}
    with tempfile.TemporaryDirectory() as td, shim:
        composed_pth, bare_pth = _export_pths(
            args.exp_root, args.reference_root, td)
        ns = _make_args(cfg, args.val_set)
        print("[refeval] pass 1: reference test.test() on bare EaBNet "
              "(esti0)", flush=True)
        results["ref_esti0"] = run_reference_bare(
            ref_test, ns, bare_pth, args.val_set)
        print("[refeval] pass 2: reference EaBNetWithPostNet (esti)",
              flush=True)
        results["ref_esti"] = run_reference_composed(
            ref_test, ns, composed_pth, args.val_set)

    _, state = create_train_state(cfg, jax.random.key(0))
    state, _ = load_checkpoint(ckpt, state, cfg)
    # the reference iSTFTs the COMPRESSED spectrum (test.py:189-190 —
    # no mag^2 expansion before torch.istft); our default inverts the
    # compression (dsp/stft.py::stft_to_wav). Score our stack BOTH ways:
    # 'ours' = reference emulation (decompress_output=False, the
    # apples-to-apples parity column) and 'ours_decompressed' = our
    # default output path (systematically higher — the divergence is a
    # reconstruction improvement, not a model difference).
    import dataclasses

    cfg_emul = dataclasses.replace(
        cfg, stft=dataclasses.replace(cfg.stft, decompress_output=False))
    for stage in ("esti0", "esti"):
        print(f"[refeval] pass 3: our harness ({stage})", flush=True)
        results[f"ours_{stage}"] = run_our_harness(
            cfg_emul, state.params, args.val_set, stage)
        results[f"oursdec_{stage}"] = run_our_harness(
            cfg, state.params, args.val_set, stage)

    n = len(results["ref_esti0"])
    lines = [
        "# Reference-stack evaluation (full loop)", "",
        f"Artifact: `{ckpt}` exported via tools/export_reference_pth.py; "
        f"val set: `{args.val_set}` ({n} items).",
        "Reference rows are produced by the reference's own code run "
        "live from /root/reference: `test.test()` / "
        "`EaBNetWithPostNet` + `prepare_data` + `torch.istft` + "
        "`cal_single_metrics` (reference: test.py:126-212, "
        "EaBNet.py:127-155).",
        f"Package substitutions (absent in this image): {subbed} -> "
        f"first-party backends with identical signatures; PESQ backend "
        f"= `{pesq_backend()}` for BOTH stacks, so PESQ columns compare "
        "implementation-identically.", "",
    ]
    for stage in ("esti0", "esti"):
        ref = _summarize(results[f"ref_{stage}"], keys)
        ours = _summarize(results[f"ours_{stage}"], keys)
        dec = _summarize(results[f"oursdec_{stage}"], keys)
        lines.append(f"## {stage}")
        lines.append("")
        lines.append("| metric | reference stack | ours (reference "
                     "emulation) | |delta| | ours (default, "
                     "decompressed iSTFT) |")
        lines.append("|---|---|---|---|---|")
        for k in keys:
            r, o, e = ref[k], ours[k], dec[k]
            d = abs(r[0] - o[0])
            lines.append(f"| {k} | {r[0]:.4f} ± {r[1]:.4f} | "
                         f"{o[0]:.4f} ± {o[1]:.4f} | {d:.4f} | "
                         f"{e[0]:.4f} ± {e[1]:.4f} |")
        worst = {}
        for k in keys:
            dv = [abs(a[k] - b[k]) for a, b in
                  zip(results[f"ref_{stage}"], results[f"ours_{stage}"])]
            worst[k] = float(np.max(dv))
        lines.append("")
        lines.append("Worst per-item |reference − emulation| across the "
                     "set: "
                     + ", ".join(f"{k} {v:.2e}" for k, v in worst.items()))
        lines.append("")

    if args.csv_prefix:
        for name, rows in results.items():
            path = f"{args.csv_prefix}_{name}.csv"
            cols = [c for c in rows[0] if c != "filename"]
            with open(path, "w") as f:
                f.write(",".join(["item"] + cols) + "\n")
                for i, r in enumerate(rows):
                    f.write(",".join([f"{i:05d}"]
                                     + [f"{float(r[c]):.6f}" for c in cols])
                            + "\n")
            lines.append(f"Per-item CSV: `{path}`")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"[refeval] wrote {args.out}", flush=True)
    summary = {s: {k: round(_summarize(results[s], keys)[k][0], 4)
                   for k in keys} for s in ("ref_esti0", "ref_esti")}
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
