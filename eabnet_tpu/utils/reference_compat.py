"""Runtime compatibility shims for running cLN models on the reference
torch stack.

The reference's cumulative-layer-norm support is unfinished in two ways:

* ``EaBNet.NormSwitch`` passes the dim-size STRING (``"1D"``/``"2D"``)
  as ``num_features`` when constructing its cumulative norms
  (reference: EaBNet.py:689-691), so ANY ``norm_type='cLN'`` reference
  model crashes at construction — the norm classes themselves are sound
  (EaBNet.py:696-769), only the wiring is broken.
* ``GaGNet.NormSwitch`` has no cLN branch at all (reference:
  GaGNet.py:563-590), so the composed ``EaBNetWithPostNet`` cannot be
  built with cumulative norms even once the EaBNet wiring is fixed.

:func:`patch_reference_cln` repairs both in-memory — the reference's
files are never touched: EaBNet's cLN branch receives the channel count
it plainly intended to pass, and GaGNet's switch gains a cLN branch
delegating to EaBNet's ``CumulativeLayerNorm{1,2}d``. With the patch
active, ``norm_type='cLN-ref'`` checkpoints exported by
``tools/export_reference_pth.py`` load ``strict=True`` and match this
framework's forward bit-for-bit at float32 round-off
(tests/test_parity_cln.py); ``norm_type='cLN'`` (the gradient-stabilized
training variant) diverges only by the documented virtual-frame prior,
largest at frame 0 and decaying ~1/t.
"""

from __future__ import annotations

import contextlib


def _needs_cln_patch(cfg) -> bool:
    """True if any sub-model of a ComposedConfig (or a bare model config)
    uses a cumulative norm, i.e. the reference stack needs the shim."""
    norms = set()
    for sub in ("eabnet", "gagnet"):
        m = getattr(cfg, sub, None)
        if m is not None:
            norms.add(m.norm_type)
    norms.add(getattr(cfg, "norm_type", None))
    return bool(norms & {"cLN", "cLN-ref"})


@contextlib.contextmanager
def patch_reference_cln():
    """Fix the reference's NormSwitch wiring for the duration.

    Requires the reference source tree on ``sys.path`` (so ``import
    EaBNet`` / ``import GaGNet`` resolve to it). Always safe to enter:
    the replacement inits are behavior-identical for BN/IN.
    """
    import EaBNet as eab_mod
    import GaGNet as gag_mod
    import torch.nn as tnn

    def _fixed_init(mod_ns, allowed):
        def init(self, norm_type, dim_size, c):
            tnn.Module.__init__(self)
            self.norm_type = norm_type
            self.dim_size = dim_size
            self.c = c
            assert norm_type in allowed and dim_size in ("1D", "2D")
            one_d = dim_size == "1D"
            if norm_type == "BN":
                self.norm = (tnn.BatchNorm1d if one_d
                             else tnn.BatchNorm2d)(c)
            elif norm_type == "IN":
                self.norm = (tnn.InstanceNorm1d if one_d
                             else tnn.InstanceNorm2d)(c, affine=True)
            else:
                # the one-line repair: pass the channel count, not the
                # dim-size label (reference EaBNet.py:689-691); GaGNet
                # gains the branch outright, reusing EaBNet's classes
                self.norm = (mod_ns.CumulativeLayerNorm1d if one_d
                             else mod_ns.CumulativeLayerNorm2d)(
                                 c, affine=True)
        return init

    saved = (eab_mod.NormSwitch.__init__, gag_mod.NormSwitch.__init__)
    eab_mod.NormSwitch.__init__ = _fixed_init(
        eab_mod, ("BN", "IN", "cLN"))
    gag_mod.NormSwitch.__init__ = _fixed_init(
        eab_mod, ("BN", "IN", "cLN"))
    try:
        yield
    finally:
        eab_mod.NormSwitch.__init__ = saved[0]
        gag_mod.NormSwitch.__init__ = saved[1]
