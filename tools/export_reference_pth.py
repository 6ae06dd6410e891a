"""Export a TPU-trained checkpoint as a reference-format `.pth`.

The reverse of the `.pth` ingestion path: takes one of this framework's
experiment dirs or release artifacts (config.json + `<iter>.ckpt` /
`<iter>.params`) and writes `{model_state_dict, iteration, epoch}` in the
reference trainer's checkpoint format (reference:
train_distributed.py:30-45), loadable by the reference's own
`enhance.py`/`test.py` with `strict=True`. Together with the forward
converter this closes the interop loop: reference -> TPU (ingest, resume,
enhance) and TPU -> reference (deploy trained models on the torch stack).

Requires torch and the reference source tree (to build the key/shape
template the exporter scatters into):

    python tools/export_reference_pth.py --exp-root release/composed_9mic \
        --reference-root /root/reference --out /tmp/26000.pth
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp-root", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--reference-root", default="/root/reference")
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    import torch

    from eabnet_tpu.config import ExperimentConfig
    from eabnet_tpu.train.checkpoint import (
        latest_checkpoint, load_checkpoint,
    )
    from eabnet_tpu.train.step import create_train_state
    from eabnet_tpu.utils.convert_args import reference_args_from_config
    from eabnet_tpu.utils.convert_torch import (
        _warn_cln_interop, export_torch_state_dict,
    )

    cfg = ExperimentConfig.load(os.path.join(args.exp_root, "config.json"))
    _warn_cln_interop(cfg.model)
    ckpt = args.ckpt or latest_checkpoint(
        os.path.join(args.exp_root, "ckpt")
    ) or latest_checkpoint(args.exp_root)
    if ckpt is None:
        raise FileNotFoundError(f"no checkpoint under {args.exp_root}")
    _, state = create_train_state(cfg, jax.random.key(0))
    state, epoch = load_checkpoint(ckpt, state, cfg)

    if args.reference_root not in sys.path:
        sys.path.insert(0, args.reference_root)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    import contextlib

    import EaBNet as ref_mod

    from eabnet_tpu.utils.reference_compat import (
        _needs_cln_patch, patch_reference_cln,
    )

    # cumulative-norm configs need the reference's NormSwitch repaired
    # before the template net can even be constructed
    shim = (patch_reference_cln() if _needs_cln_patch(cfg.model)
            else contextlib.nullcontext())
    with shim:
        template = ref_mod.make_eabnet_with_postnet(
            reference_args_from_config(cfg.model)
        ).state_dict()
    sd, unmapped = export_torch_state_dict(
        state.params, cfg.model, template
    )
    if unmapped:
        print(f"[export] template-valued (unmapped) keys: {unmapped}")
    torch.save(
        {
            "model_state_dict": {k: torch.from_numpy(v.copy())
                                 for k, v in sd.items()},
            "iteration": int(jax.device_get(state.step)),
            "epoch": int(epoch),
        },
        args.out,
    )
    print(f"[export] {ckpt} -> {args.out} "
          f"({os.path.getsize(args.out) / 1e6:.1f} MB, "
          f"{len(sd)} tensors)")


if __name__ == "__main__":
    main()
