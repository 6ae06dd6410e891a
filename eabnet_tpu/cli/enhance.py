"""Enhancement CLI: `python -m eabnet_tpu.cli.enhance in.wav out.wav
--exp-root <dir>` (reference: enhance.py + inference.bash).

Accepts a directory of wavs as input for batch mode (replacing the
reference's inference.bash shell loop)."""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description="offline enhancement")
    parser.add_argument("input", help="input wav or directory of wavs")
    parser.add_argument("output", help="output wav or directory")
    parser.add_argument("--exp-root", required=True,
                        help="experiment dir with config.json + checkpoint")
    parser.add_argument("--ckpt", default=None,
                        help="explicit checkpoint (.ckpt or reference .pth)")
    parser.add_argument("--output-stage", default="esti",
                        choices=["esti", "esti0"],
                        help="esti = composed EaBNet+GaGNet (reference "
                        "enhance.py), esti0 = bare EaBNet beamformer")
    parser.add_argument("--compute-dtype", default="float32",
                        choices=["float32", "bfloat16", "int8w"],
                        help="bfloat16 runs the model on the MXU in bf16 "
                        "(front-end/iSTFT stay f32) — the high-throughput "
                        "serving mode; int8w additionally stores the "
                        "weights as per-channel int8 in HBM (4x "
                        "parameter footprint, bf16 compute); quality "
                        "deltas vs f32 in ROOFLINE.md")
    parser.add_argument("--mesh", action="store_true",
                        help="shard batches over ALL local devices "
                        "(params replicate, batch shards over the "
                        "'data' mesh axis) — multi-chip serving; the "
                        "reference enhances one file on one GPU")
    parser.add_argument("--batch-size", type=int, default=None,
                        help="files per device batch in directory mode "
                        "(default: 1, or the mesh size with --mesh)")
    parser.add_argument("--shard-freq", action="store_true",
                        help="frequency-axis MODEL parallelism: all "
                        "devices split the network's F axis (1 x N "
                        "('data','freq') mesh) — batch-1 LATENCY "
                        "scaling (lane-parallel LSTM head, "
                        "halo-exchanged freq convs); exclusive with "
                        "--mesh (which scales THROUGHPUT via batch)")
    parser.add_argument(
        "--mic-permutation", default=None,
        help="comma-separated capture-channel order, e.g. 7,0,1,2,3,4,5,6 "
        "(reference: enhance.py:41-42)",
    )
    args = parser.parse_args(argv)

    from eabnet_tpu.cli.common import respect_jax_platforms_env

    respect_jax_platforms_env()

    from eabnet_tpu.inference import load_enhancer

    perm = None
    if args.mic_permutation:
        perm = [int(x) for x in args.mic_permutation.split(",")]

    mesh = None
    if args.mesh and args.shard_freq:
        raise SystemExit("--mesh (batch/throughput) and --shard-freq "
                         "(model/latency) are exclusive")
    if args.mesh:
        from eabnet_tpu.parallel import make_mesh

        mesh = make_mesh()
    elif args.shard_freq:
        from eabnet_tpu.parallel import make_mesh

        mesh = make_mesh(("data", "freq"), sizes=(1, -1))

    enhancer = load_enhancer(args.exp_root, args.ckpt,
                             output=args.output_stage,
                             compute_dtype=args.compute_dtype,
                             mesh=mesh, shard_freq=args.shard_freq)

    if os.path.isdir(args.input):
        os.makedirs(args.output, exist_ok=True)
        names = sorted(
            n for n in os.listdir(args.input) if n.endswith(".wav")
        )
        bs = args.batch_size or (mesh.shape["data"] if mesh else 1)
        if mesh is not None and bs % mesh.shape["data"] != 0:
            # a chunk smaller than the mesh quantum is silently zero-
            # padded up to it inside enhance_batch, leaving most devices
            # computing padding — round up instead
            bs = -(-bs // mesh.shape["data"]) * mesh.shape["data"]
            print(f"--batch-size rounded up to {bs} (the mesh's 'data' "
                  f"axis is {mesh.shape['data']} wide; smaller chunks "
                  "would run part-empty device batches)")
        if bs > 1:
            print(f"enhancing {len(names)} files in batches of {bs}")
            enhancer.enhance_files(
                [os.path.join(args.input, n) for n in names],
                [os.path.join(args.output, n) for n in names],
                mic_permutation=perm, batch_size=bs,
            )
        else:
            for name in names:
                print(f"enhancing {name}")
                enhancer.enhance_file(
                    os.path.join(args.input, name),
                    os.path.join(args.output, name),
                    mic_permutation=perm,
                )
    else:
        enhancer.enhance_file(args.input, args.output, mic_permutation=perm)


if __name__ == "__main__":
    main()
