"""Demo: deterministic scene -> synthesis -> enhancement -> metrics.

The script equivalent of the reference's demo.ipynb: pin a scene with the
`specific` override dict, synthesize the 9-mic mixture, enhance it with a
trained experiment (or randomly-initialized weights if none given), and
print the metric battery of the result.

    python examples/demo.py --settings dataset_settings.json \
        --speech sp.wav --noise-dir noises/ [--exp-root exp/]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--settings", required=True)
    parser.add_argument("--speech", required=True)
    parser.add_argument("--noise-dir", required=True)
    parser.add_argument("--exp-root", default=None)
    parser.add_argument("--out-dir", default="demo_out")
    args = parser.parse_args()

    import numpy as np

    from eabnet_tpu.data.datasets import synthesize_item
    from eabnet_tpu.data.scenes import load_settings
    from eabnet_tpu.eval import cal_single_metrics
    from eabnet_tpu.utils.audio_io import write_wav

    opt = load_settings(args.settings)
    noises = sorted(
        os.path.join(args.noise_dir, n)
        for n in os.listdir(args.noise_dir)
        if n.endswith(".wav")
    )

    # deterministic scene, like demo.ipynb cell 8
    specific = {
        "room_dim": [6.0, 5.0, 3.0],
        "target_xyz": [3.0, 3.5, 1.2],
        "mics_xyz": [3.0, 1.5, 1.3],
        "noise_xyz_list": [[1.0, 4.0, 1.2], [5.0, 1.0, 1.2]],
        "noise_snr_list": [1.0, 1.0],
        "rt60": 0.3,
        "noisy_dBFS": -20.0,
    }
    noisy, clean, meta = synthesize_item(
        opt, 6.0, args.speech, noises[:2], seed=0, specific=specific,
        return_meta=True,
    )
    print("scene:", {k: meta[k] for k in ("room_dim", "rt60", "snrs_db")})

    os.makedirs(args.out_dir, exist_ok=True)
    write_wav(os.path.join(args.out_dir, "noisy.wav"), 16000, noisy)
    write_wav(os.path.join(args.out_dir, "clean.wav"), 16000, clean)

    if args.exp_root:
        from eabnet_tpu.inference import load_enhancer

        enhancer = load_enhancer(args.exp_root)
    else:
        print("no --exp-root given; using randomly initialized weights")
        import jax

        from eabnet_tpu.config import ExperimentConfig
        from eabnet_tpu.inference import Enhancer
        from eabnet_tpu.train.step import create_train_state

        cfg = ExperimentConfig()
        _, state = create_train_state(cfg, jax.random.key(0))
        enhancer = Enhancer(cfg, state.params)

    esti = enhancer(noisy)
    write_wav(os.path.join(args.out_dir, "enhanced.wav"), 16000, esti)

    scores = cal_single_metrics(clean, noisy[0], np.asarray(esti))
    for k, v in scores.items():
        if v is not None:
            print(f"{k}: {v:.3f}")
    print(f"wavs written to {args.out_dir}/")


if __name__ == "__main__":
    main()
