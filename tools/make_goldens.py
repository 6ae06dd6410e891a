"""Generate committed golden files from the reference implementation.

Runs the PyTorch reference (mounted at /root/reference) on fixed inputs with
a reduced-size config, and records {state_dict, input, outputs} as compressed
npz under tests/golden/. The committed goldens let `tests/test_golden.py`
prove numerical parity WITHOUT the reference mounted (standalone CI).

Usage: python tools/make_goldens.py
"""

import os
import sys

import numpy as np
import torch

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")

sys.path.insert(0, REF)
import EaBNet as ref_eab  # noqa: E402
import GaGNet as ref_gag  # noqa: E402

# Reduced config: same topology, fewer channels/blocks -> ~100x smaller files.
SMALL_EAB = dict(k1=(2, 3), k2=(1, 3), c=16, M=3, embed_dim=16, kd1=5,
                 cd1=16, d_feat=256, p=2, q=2, is_causal=True, is_u2=True,
                 bf_type="lstm", topo_type="mimo", intra_connect="cat",
                 norm_type="IN")
SMALL_GAG = dict(cin=2, k1=(2, 3), k2=(1, 3), c=16, kd1=3, cd1=16,
                 d_feat=256, p=1, q=2, dilas=[1, 2, 5, 9], fft_num=320,
                 is_u2=True, is_causal=True, is_squeezed=False,
                 acti_type="sigmoid", intra_connect="cat", norm_type="IN")


def save(name, sd, arrays):
    data = {f"sd::{k}": v.detach().numpy() for k, v in sd.items()}
    data.update(arrays)
    path = os.path.join(OUT, f"{name}.npz")
    np.savez_compressed(path, **data)
    print(f"{path}: {os.path.getsize(path)/1e6:.2f} MB")


def main():
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(2024)
    b, t, f, m = 2, 31, 161, SMALL_EAB["M"]

    torch.manual_seed(7)
    net = ref_eab.EaBNet(**SMALL_EAB)
    net.eval()
    x = (rng.standard_normal((b, t, f, m, 2)) * 0.3).astype(np.float32)
    with torch.no_grad():
        y = net(torch.from_numpy(x)).numpy()
    save("eabnet_small", net.state_dict(), {"x": x, "y": y})

    torch.manual_seed(8)
    gnet = ref_gag.GaGNet(**SMALL_GAG)
    gnet.eval()
    inpt = (rng.standard_normal((b, 2, t, f)) * 0.3).astype(np.float32)
    pre = (rng.standard_normal((b, 2, t, f)) * 0.3).astype(np.float32)
    with torch.no_grad():
        outs = gnet(torch.from_numpy(inpt), torch.from_numpy(pre))
    save(
        "gagnet_small",
        gnet.state_dict(),
        {"inpt": inpt, "pre": pre,
         **{f"y{i}": o.numpy() for i, o in enumerate(outs)}},
    )


if __name__ == "__main__":
    main()
