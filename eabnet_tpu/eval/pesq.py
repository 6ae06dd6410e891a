"""PESQ (ITU-T P.862) gateway.

PESQ is an ITU reference C implementation; the reference repo wraps the
`pesq` PyPI package (metrics.py:10, test.py:81-82). That package is not in
this image and P.862 conformance requires the ITU sources, so this module:

- uses the `pesq` package transparently when importable,
- otherwise returns None (reported as NaN / omitted in summaries) with a
  one-time warning.

The evaluation harness and reports treat a missing PESQ backend gracefully;
all other metrics (STOI/ESTOI/SI-SDR family) are first-party.
"""

from __future__ import annotations

import warnings
from typing import Optional

import numpy as np

_warned = False


def pesq_available() -> bool:
    try:
        import pesq as _  # noqa: F401

        return True
    except ImportError:
        return False


def pesq(sr: int, ref: np.ndarray, deg: np.ndarray,
         mode: str = "wb") -> Optional[float]:
    """PESQ MOS-LQO, or None when no conformant backend exists."""
    global _warned
    try:
        from pesq import pesq as _pesq

        return float(_pesq(sr, ref, deg, mode))
    except ImportError:
        if not _warned:
            warnings.warn(
                "PESQ backend (ITU-T P.862 C implementation) not available;"
                " PESQ scores will be reported as NaN. Install the `pesq`"
                " package to enable them."
            )
            _warned = True
        return None
