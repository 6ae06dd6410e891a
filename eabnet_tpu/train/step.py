"""Jitted SPMD train/eval steps.

One fused XLA program per step: STFT featurization -> composed model ->
losses -> grads -> global-norm clip -> Adam update, compiled once under
`jax.jit` with NamedShardings (batch sharded over 'data', params
replicated). XLA SPMD inserts the gradient all-reduce over ICI — the
TPU-native equivalent of the reference's DDP backward hooks + NCCL
(reference: train_distributed.py:168,198,228-230; Adam lr 5e-4,
clip 1.0 at lines 185, 229).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from eabnet_tpu.config import ExperimentConfig
from eabnet_tpu.dsp import prepare_data
from eabnet_tpu.losses import eabnet_with_postnet_loss, frame_mask
from eabnet_tpu.models import EaBNetWithPostNet, build_model
from eabnet_tpu.models.eabnet import from_reference_layout


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    # batch_stats is non-empty only for norm_type == "BN"
    batch_stats: Any = struct.field(default_factory=dict)


def make_optimizer(cfg: ExperimentConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.train.grad_clip),
        optax.adam(cfg.train.lr),
    )


def create_train_state(cfg: ExperimentConfig, rng: jax.Array) -> Tuple:
    """Initialize model + optimizer. Returns (model, state)."""
    model = build_model(cfg.model)
    t = cfg.stft.num_frames(int(cfg.train.wav_len * cfg.stft.sr))
    dummy = jnp.zeros(
        (1, t, cfg.stft.freq_bins, cfg.model.eabnet.M, 2), jnp.float32
    )
    variables = model.init(rng, dummy)
    params = variables["params"]
    tx = make_optimizer(cfg)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=variables.get("batch_stats", {}),
    )
    return model, state


def _freeze_mask(params, frozen_top_level: str):
    """Pytree of 0/1 multipliers zeroing grads under one top-level module
    (the reference's freeze_eabnet, EaBNet.py:150-155)."""
    return {
        k: jax.tree.map(lambda _: 0.0 if k == frozen_top_level else 1.0, v)
        for k, v in params.items()
    }


def _dequant(wav):
    """int16 transport batches -> float on device (DataConfig.
    transfer_int16: the loader ships the wavs' native samples to halve
    host->device bytes; the division matches utils/audio_io.read_wav)."""
    if wav.dtype == jnp.int16:
        return wav.astype(jnp.float32) / 32768.0
    return wav


def _valid_frames(n_samples, total_frames: int, cfg: ExperimentConfig,
                  total_samples: int):
    """(B,) true sample counts -> (B,) valid loss-mask frame counts.

    Items at the padded batch's full length keep every frame (reference
    parity: frame_list = [T]*B, train_distributed.py:224). Shorter items
    are masked conservatively to frames whose analysis window lies entirely
    inside their true samples, so zero-padding can never leak into the loss.
    """
    n = jnp.asarray(n_samples)
    full = 1 + n // cfg.stft.hop_samples
    supported = 1 + jnp.maximum(n - cfg.stft.win_samples, 0) \
        // cfg.stft.hop_samples
    frames = jnp.where(n >= total_samples, full, supported)
    return jnp.minimum(frames, total_frames)


def make_train_step(
    cfg: ExperimentConfig,
    model: Optional[EaBNetWithPostNet] = None,
    donate: bool = True,
    batch_kind: str = "wav",
    scene_dims: Optional[dict] = None,
) -> Callable:
    """Build the jitted train step.

    ``batch_kind`` selects the input contract — all three compile to ONE
    fused XLA program (synthesis, featurization, model, grads, update):

    - "wav"   (state, noisy_wav (B,M,N), target_wav (B,N), n_samples)
              — pre-mixed audio (offline data, or host-mixed online).
    - "parts" (state, batch dict) — dry sources + dense RIRs from the
              loader (DataConfig.device_mix="parts"); the room
              propagation runs inside the step (data/device_mix.py::
              mix_parts), so the mixed batch never leaves HBM.
    - "scene" (state, batch dict, corpus_speech, corpus_noise) — scene
              parameters only (DataConfig.device_mix="scene"); the step
              reconstructs RIRs and propagates against the
              device-resident corpus (data/scene_mix.py::mix_scene).
              ``scene_dims`` are the static shapes from
              scene_static_dims.
    """
    model = model or build_model(cfg.model)
    tx = make_optimizer(cfg)
    has_bn = (
        cfg.model.eabnet.norm_type == "BN"
        or cfg.model.gagnet.norm_type == "BN"
    )
    compute_dtype = (
        jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16"
        else jnp.float32
    )

    def apply_model(variables, noisy_stft):
        if has_bn:
            return model.apply(variables, noisy_stft, train=True,
                               mutable=["batch_stats"])
        return model.apply(variables, noisy_stft, train=True), None

    policy = "full" if cfg.train.remat else cfg.train.remat_policy
    if policy == "full":
        # trade recompute for HBM: activations are rematerialized in the
        # backward pass instead of stored
        apply_model = jax.checkpoint(apply_model)
    elif policy == "dots":
        # keep matmul/conv outputs, recompute elementwise ops in backward.
        # Measured on v5e bf16 batch 8: ~10% SLOWER than no remat (128.6
        # vs 116.2 ms back-to-back, tools/bench_train.py --remat-policy) —
        # at this model size there is no HBM pressure to relieve, so
        # recompute is pure cost. Kept as an option for memory-constrained
        # configs (e.g. long-utterance or large-batch training).
        apply_model = jax.checkpoint(
            apply_model, policy=jax.checkpoint_policies.dots_saveable
        )

    def loss_fn(params, batch_stats, noisy_wav, target_wav, n_samples):
        noisy_stft, target_stft = prepare_data(noisy_wav, target_wav,
                                               cfg.stft)
        target = from_reference_layout(target_stft)
        noisy_stft = noisy_stft.astype(compute_dtype)
        if compute_dtype != jnp.float32:
            # classic mixed precision: cast the f32 master weights to the
            # compute dtype inside the differentiated function — convs and
            # matmuls run bf16 on the MXU, grads flow back through the
            # cast as f32
            params = jax.tree.map(
                lambda p: p.astype(compute_dtype), params
            )
        variables = {"params": params}
        if has_bn:
            variables["batch_stats"] = batch_stats
            out, mutated = apply_model(variables, noisy_stft)
            new_stats = mutated["batch_stats"]
        else:
            out, _ = apply_model(variables, noisy_stft)
            new_stats = batch_stats
        out = jax.tree.map(lambda x: x.astype(jnp.float32), out)
        mask = frame_mask(
            _valid_frames(n_samples, noisy_stft.shape[1], cfg,
                          noisy_wav.shape[-1]),
            noisy_stft.shape[1],
        )
        losses = eabnet_with_postnet_loss(out, target, mask)
        return losses["final"], (losses, new_stats)

    def step_body(state: TrainState, noisy_wav, target_wav, n_samples):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (losses, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, noisy_wav, target_wav,
            n_samples,
        )
        if cfg.model.freeze_eabnet:
            mask = _freeze_mask(state.params, "eabnet")
            grads = jax.tree.map(lambda g, m: g * m, grads, mask)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        if cfg.model.freeze_eabnet:
            # masking grads alone is not enough: Adam momentum carried
            # over from an unfrozen phase (e.g. a two-phase freeze recipe
            # resuming from a joint checkpoint) still produces nonzero
            # updates from zero grads. The reference's requires_grad=False
            # params never move (torch Adam skips None grads,
            # EaBNet.py:150-155) — match that by masking the updates too.
            updates = jax.tree.map(lambda u, m: u * m, updates, mask)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt,
            batch_stats=new_stats,
        )
        return new_state, losses

    donate_args = (0,) if donate else ()
    if batch_kind == "wav":

        def train_step(state: TrainState, noisy_wav, target_wav,
                       n_samples=None):
            noisy_wav = _dequant(noisy_wav)
            target_wav = _dequant(target_wav)
            if n_samples is None:
                n_samples = jnp.full((noisy_wav.shape[0],),
                                     noisy_wav.shape[-1], jnp.int32)
            return step_body(state, noisy_wav, target_wav, n_samples)

        return jax.jit(train_step, donate_argnums=donate_args)

    if batch_kind == "parts":
        from eabnet_tpu.data.device_mix import mix_parts

        def train_step(state: TrainState, batch):
            noisy_wav, target_wav = mix_parts(
                batch, batch["sources"].shape[-1])
            return step_body(state, noisy_wav, target_wav,
                             batch["lengths"])

        return jax.jit(train_step, donate_argnums=donate_args)

    if batch_kind == "scene":
        if scene_dims is None:
            raise ValueError("batch_kind='scene' needs scene_dims")
        from eabnet_tpu.data.scene_mix import mix_scene

        def train_step(state: TrainState, batch, corpus_speech,
                       corpus_noise):
            noisy_wav, target_wav = mix_scene(
                batch, corpus_speech, corpus_noise, scene_dims)
            return step_body(state, noisy_wav, target_wav,
                             batch["lengths"])

        return jax.jit(train_step, donate_argnums=donate_args)

    raise ValueError(f"unknown batch_kind {batch_kind!r}")


def make_eval_step(cfg: ExperimentConfig,
                   model: Optional[EaBNetWithPostNet] = None) -> Callable:
    """Jitted eval step: (state, noisy_wav, target_wav) ->
    (loss dict, esti_stft (B,T,F,2))."""
    model = model or build_model(cfg.model)
    has_bn = (
        cfg.model.eabnet.norm_type == "BN"
        or cfg.model.gagnet.norm_type == "BN"
    )

    @jax.jit
    def eval_step(state: TrainState, noisy_wav, target_wav, n_samples=None):
        noisy_wav = _dequant(noisy_wav)
        target_wav = _dequant(target_wav)
        if n_samples is None:
            n_samples = jnp.full((noisy_wav.shape[0],),
                                 noisy_wav.shape[-1], jnp.int32)
        noisy_stft, target_stft = prepare_data(noisy_wav, target_wav,
                                               cfg.stft)
        target = from_reference_layout(target_stft)
        variables = {"params": state.params}
        if has_bn:
            variables["batch_stats"] = state.batch_stats
        out = model.apply(variables, noisy_stft, train=False)
        mask = frame_mask(
            _valid_frames(n_samples, noisy_stft.shape[1], cfg,
                          noisy_wav.shape[-1]),
            noisy_stft.shape[1],
        )
        losses = eabnet_with_postnet_loss(out, target, mask)
        return losses, out["esti"]

    return eval_step
