"""Smoothing weight profiles — the reference's kernel constants.

The reference hardcodes center=1.0, ring1=0.6065 (= exp(-1/(2*sigma^2)) with
sigma=1, ``src/cpu/hex_smooth_naive.cpp:66-67``) and ring2=0.1353 (= exp(-2),
``src/cuda/hex_smooth_cuda_v5.cu:37-39``).  We pin the *full-precision decimal
literals* of those doubles so the Ray pipeline and the generated DuckDB oracle
parse bit-identical constants (library ``exp()`` may differ by 1 ulp between
numpy and DuckDB); a unit test asserts the literals equal the formula to 1e-12.
"""

from __future__ import annotations

WEIGHT_CENTER = 1.0
# exp(-0.5) and exp(-2.0) as exact double literals
WEIGHT_RING1_GAUSS = 0.6065306597126334
WEIGHT_RING2_GAUSS = 0.1353352832366127
WEIGHT_RING_UNIFORM = 1.0

#: name -> (w_center, w_ring1, w_ring2); k=1 profiles ignore w_ring2.
PROFILES: dict[str, tuple[float, float, float]] = {
    "uniform": (WEIGHT_CENTER, WEIGHT_RING_UNIFORM, WEIGHT_RING_UNIFORM),
    "gaussian": (WEIGHT_CENTER, WEIGHT_RING1_GAUSS, WEIGHT_RING2_GAUSS),
}


def ring_weights(profile: str, k: int) -> list[float]:
    """Per-ring weights [w(ring0=center), w(ring1), ...] up to ring k."""
    if profile not in PROFILES:
        raise ValueError(f"unknown weight profile {profile!r}")
    w0, w1, w2 = PROFILES[profile]
    if k == 1:
        return [w0, w1]
    if k == 2:
        return [w0, w1, w2]
    raise ValueError(f"k must be 1 or 2, got {k}")
