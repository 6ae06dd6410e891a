"""Per-component train-cost breakdown on the current accelerator.

Times jitted forward and forward+backward of each stage of the composed
model (encoder, TCN stack, decoder, LSTM head, GaGNet, STFT front-end) with
the chained-execution methodology from bench.py (tunnel-safe). Guides the
Pallas/layout optimization work (VERDICT r1 item 3).

    python tools/bench_components.py [--batch 8] [--dtype bfloat16] [--k 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _chain_time(fn, args, k, rtt=0.03):
    """Median-of-3 chained timing: scan fn k times with a data dependency."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(*a):
        def total(out):
            # consume EVERY output leaf so no part of fn is dead code
            return sum(jnp.sum(leaf.astype(jnp.float32))
                       for leaf in jax.tree.leaves(out))

        def body(c, _):
            # fold a scalar of the output back into the first arg so every
            # iteration depends on the previous one (no DCE, no overlap)
            s = total(fn(*c[0], c[1])) * 1e-30
            newargs = tuple(x + s.astype(x.dtype) if i == 0 else x
                            for i, x in enumerate(c[0]))
            return (newargs, c[1]), None
        (carry, params), _ = jax.lax.scan(
            body, (a[:-1], a[-1]), None, length=k)
        return total(fn(*carry, params))

    v = chain(*args)
    float(v)  # compile + settle
    times = []
    for _ in range(3):
        t0 = time.time()
        float(chain(*args))
        times.append((time.time() - t0 - rtt) / k)
    return float(np.median(times))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--bf-impl", default="pallas",
                    choices=["scan", "pallas"])
    ap.add_argument("--conv-impl", default="xla", choices=["phase", "xla", "s2d"],
                    help="freq-strided conv implementation in the "
                    "encoder/decoder blocks (polyphase vs XLA strided)")
    ap.add_argument("--tcn-impl", default="xla",
                    choices=["xla", "pallas"],
                    help="squeezed-TCN group implementation: module chain "
                    "vs the fused activation-resident Pallas kernel "
                    "(kernels/tcm_chain.py)")
    ap.add_argument("--gag-fused", default="off", choices=["on", "off"],
                    help="fused stacked execution of the GaGNet "
                    "glance/gaze TCN stacks (models/gagnet_fused.py)")
    ap.add_argument("--stages", default="",
                    help="comma list to restrict (encoder,tcn,decoder,"
                    "head,gagnet,stft,full)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from eabnet_tpu.config import (
        ComposedConfig,
        EaBNetConfig,
        ExperimentConfig,
        GaGNetConfig,
        TrainConfig,
    )
    from eabnet_tpu.dsp import prepare_data
    from eabnet_tpu.models import build_model
    from eabnet_tpu.models.eabnet import (
        LSTMBeamformer,
        beamform_sum,
    )
    from eabnet_tpu.nn.blocks import (
        SqueezedTCNGroup,
        U2NetDecoder,
        U2NetEncoder,
    )

    cfg = ExperimentConfig(
        model=ComposedConfig(
            eabnet=EaBNetConfig(bf_impl=args.bf_impl,
                                tcn_impl=args.tcn_impl),
            gagnet=GaGNetConfig(fused_stages=args.gag_fused == "on",
                                tcn_impl=args.tcn_impl)),
        train=TrainConfig(batch_size=args.batch),
    )
    ecfg = cfg.model.eabnet
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    b = args.batch
    n = int(cfg.train.wav_len * cfg.stft.sr)
    t = cfg.stft.num_frames(n)
    f = cfg.stft.freq_bins
    m = ecfg.M
    rng = np.random.default_rng(0)
    key = jax.random.key(0)

    want = set(s for s in args.stages.split(",") if s) or None

    def run(name, module_fn, shape, init_shape=None):
        if want and name not in want:
            return
        x = jnp.asarray(
            rng.standard_normal(shape).astype(np.float32) * 0.1, dtype)
        module, apply_kw = module_fn()
        variables = module.init(key, jnp.asarray(
            np.zeros(init_shape or shape, np.float32), dtype), **apply_kw)
        # mirror the train step: params are cast to the compute dtype inside
        # the grad fn (train/step.py), else bf16 inputs silently promote the
        # whole stage back to f32 and we time the wrong path
        variables = jax.tree.map(
            lambda p: p.astype(dtype) if p.dtype == jnp.float32 else p,
            variables)

        def fwd(x_, params):
            return module.apply(params, x_, **apply_kw)

        def fwdbwd(x_, params):
            def loss(p):
                out = fwd(x_, p)
                return jnp.sum(jnp.square(
                    jax.tree.leaves(out)[0].astype(jnp.float32)))
            return jax.grad(loss)(params)

        t_f = _chain_time(fwd, (x, variables), args.k)
        t_fb = _chain_time(fwdbwd, (x, variables), args.k)
        print(f"{name:10s} fwd {t_f * 1e3:7.2f} ms   "
              f"fwd+bwd {t_fb * 1e3:7.2f} ms")

    class _Enc:
        def __call__(self):
            return (U2NetEncoder(ecfg.c, ecfg.k1, ecfg.k2,
                                 ecfg.intra_connect, ecfg.norm_type,
                                 impl=args.conv_impl),
                    {"train": True})

    class _Tcn:
        def __call__(self):
            class Stack(__import__("flax").linen.Module):
                @__import__("flax").linen.compact
                def __call__(self, x, train=True):
                    acc = jnp.zeros_like(x)
                    for i in range(ecfg.q):
                        x = SqueezedTCNGroup(
                            ecfg.kd1, ecfg.cd1, ecfg.d_feat,
                            dilations=tuple(2 ** j for j in range(ecfg.p)),
                            is_causal=True, norm_type=ecfg.norm_type,
                            twin_gate=True,
                            impl=ecfg.tcn_impl)(x, train)
                        acc = acc + x
                    return acc
            return Stack(), {"train": True}

    class _Head:
        def __call__(self):
            return (LSTMBeamformer(ecfg.embed_dim, m, ecfg.hid_node,
                                   impl=args.bf_impl), {})

    run("encoder", _Enc(), (b, t, f, 2 * m))
    run("tcn", _Tcn(), (b, t, ecfg.d_feat))
    run("head", _Head(), (b, t, f, ecfg.embed_dim))

    if want is None or "decoder" in want:
        enc = U2NetEncoder(ecfg.c, ecfg.k1, ecfg.k2, ecfg.intra_connect,
                           ecfg.norm_type, impl=args.conv_impl)
        x0 = jnp.asarray(
            rng.standard_normal((b, t, f, 2 * m)).astype(np.float32), dtype)
        ev = enc.init(key, x0, train=True)
        bott, skips = enc.apply(ev, x0, train=True)
        bott = bott.astype(dtype)
        skips = [s.astype(dtype) for s in skips]
        dec = U2NetDecoder(ecfg.embed_dim, ecfg.c, ecfg.k1, ecfg.k2,
                           ecfg.intra_connect, ecfg.norm_type,
                           impl=args.conv_impl)
        dv = dec.init(key, bott, skips, train=True)
        dv = jax.tree.map(
            lambda p: p.astype(dtype) if p.dtype == jnp.float32 else p, dv)

        def dfwd(x_, params):
            return dec.apply(params, x_, skips, train=True)

        def dfwdbwd(x_, params):
            def loss(p):
                return jnp.sum(jnp.square(
                    dfwd(x_, p).astype(jnp.float32)))
            return jax.grad(loss)(params)

        print(f"{'decoder':10s} fwd {_chain_time(dfwd, (bott, dv), args.k) * 1e3:7.2f} ms   "
              f"fwd+bwd {_chain_time(dfwdbwd, (bott, dv), args.k) * 1e3:7.2f} ms")

    if want is None or "gagnet" in want:
        from eabnet_tpu.models.gagnet import GaGNet

        gag = GaGNet(cfg.model.gagnet)
        xin = jnp.asarray(
            rng.standard_normal((b, t, f, 2)).astype(np.float32) * 0.1,
            dtype)
        pre = jnp.asarray(
            rng.standard_normal((b, t, f, 2)).astype(np.float32) * 0.1,
            dtype)
        gv = gag.init(key, xin, pre, train=True)
        gv = jax.tree.map(
            lambda p: p.astype(dtype) if p.dtype == jnp.float32 else p, gv)

        def gfwd(x_, params):
            return gag.apply(params, x_, pre, train=True)

        def gfwdbwd(x_, params):
            def loss(p):
                outs = gfwd(x_, p)
                return sum(jnp.sum(jnp.square(o.astype(jnp.float32)))
                           for o in outs)
            return jax.grad(loss)(params)

        print(f"{'gagnet':10s} fwd {_chain_time(gfwd, (xin, gv), args.k) * 1e3:7.2f} ms   "
              f"fwd+bwd {_chain_time(gfwdbwd, (xin, gv), args.k) * 1e3:7.2f} ms")

    if want is None or "stft" in want:
        noisy = jnp.asarray(
            rng.standard_normal((b, m, n)).astype(np.float32) * 0.1)
        target = jnp.asarray(
            rng.standard_normal((b, n)).astype(np.float32) * 0.1)

        def sfwd(x_, tgt):
            return prepare_data(x_, tgt, cfg.stft)

        print(f"{'stft':10s} fwd {_chain_time(sfwd, (noisy, target), args.k) * 1e3:7.2f} ms")

    if want is None or "full" in want:
        from eabnet_tpu.train import create_train_state, make_train_step

        cfg_bf16 = ExperimentConfig(
            model=cfg.model,
            train=TrainConfig(batch_size=b, compute_dtype=args.dtype),
        )
        model, state = create_train_state(cfg_bf16, key)
        step = make_train_step(cfg_bf16, model, donate=False)
        noisy = jnp.asarray(
            rng.standard_normal((b, m, n)).astype(np.float32) * 0.1)
        target = jnp.asarray(
            rng.standard_normal((b, n)).astype(np.float32) * 0.1)
        step(state, noisy, target)  # compile
        times = []
        for _ in range(3):
            t0 = time.time()
            s = state
            for _ in range(args.k):
                s, losses = step(s, noisy, target)
            float(losses["final"])
            times.append((time.time() - t0 - 0.03) / args.k)
        print(f"{'full step':10s} {float(np.median(times)) * 1e3:7.2f} ms "
              f"(batch {b}, {args.dtype}, {args.bf_impl} head)")


if __name__ == "__main__":
    main()
