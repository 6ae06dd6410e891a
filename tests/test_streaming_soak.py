"""Long-utterance streaming soak (VERDICT r2 item 10).

The framework claims unbounded O(1)-state streaming (SURVEY.md §5
long-context: cumulative norms + conv ring buffers + LSTM state). The
fast-tier equivalence tests run 8-12 frames; this soak drives a 60 s+
utterance (6001 frames) through the streaming engine and asserts

1. streaming == offline to tight tolerance at the full horizon (the cLN
   cumulative statistics must not drift numerically over thousands of
   frames — both paths accumulate in f32, in different orders);
2. the carried state is literally O(1): its pytree byte size is a
   T-independent constant, measured against a short-horizon run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eabnet_tpu.config import EaBNetConfig
from eabnet_tpu.models import EaBNet
from eabnet_tpu.streaming import StreamingEaBNet

F, M = 161, 3
T_LONG = 6001          # 60 s at the 10 ms hop
T_SHORT = 8


def _cfg():
    return EaBNetConfig(c=8, M=M, embed_dim=8, cd1=8, p=2, q=1,
                        norm_type="cLN")


def _state_bytes(state) -> int:
    return sum(
        np.asarray(x).nbytes for x in jax.tree.leaves(state)
        if hasattr(x, "nbytes") or isinstance(x, (np.ndarray, jnp.ndarray))
    )


@pytest.mark.slow
def test_streaming_soak_60s_matches_offline_with_o1_state():
    cfg = _cfg()
    rng = np.random.default_rng(33)
    frames = jnp.asarray(
        rng.standard_normal((1, T_LONG, F, M, 2)).astype(np.float32) * 0.3
    )
    model = EaBNet(cfg)
    variables = model.init(jax.random.key(0), frames[:, :T_SHORT])
    offline = np.asarray(model.apply(variables, frames))

    s = StreamingEaBNet(cfg, variables["params"])

    # O(1) state: the carry after 60 s has exactly the byte size of the
    # carry after 8 frames (structure and shapes are T-independent)
    state = s.init_state(1)
    size0 = _state_bytes(state)
    step = jax.jit(s.step)
    outs = []
    for t in range(T_LONG):
        state, esti = step(state, frames[:, t])
        if t in (T_SHORT - 1, T_LONG - 1):
            assert _state_bytes(state) == size0, t
        outs.append(esti)
    streamed = np.asarray(jnp.stack(outs, axis=1))

    # equality at the far end of the utterance, where cumulative-stat
    # drift would be largest: compare the LAST 2 s separately and demand
    # the same tolerance the 12-frame fast test uses
    np.testing.assert_allclose(streamed, offline, atol=2e-4)
    last = slice(None), slice(T_LONG - 200, T_LONG)
    drift = np.max(np.abs(streamed[last] - offline[last]))
    assert drift < 2e-4, f"late-horizon drift {drift:.2e}"
