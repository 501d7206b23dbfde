"""Host-side correctness oracle: exact bigint field/curve/MSM implementations.

This package is the TPU build's independent ground truth, replacing the
reference's prebuilt Aleo/snarkVM WASM oracle (SURVEY.md §2.4.4). A faster
native C++ oracle with the same semantics lives in `webgpu_msm_tpu/runtime`.
"""
from .field import (  # noqa: F401
    P,
    EDWARDS_A,
    EDWARDS_D,
    SUBGROUP_ORDER,
    R_MOD_P,
    R2_MOD_P,
    N0_INV_16,
    N0_INV_32,
    fadd,
    fsub,
    fmul,
    fneg,
    finv,
    fsqrt,
    to_mont,
    from_mont,
)
from .curve import (  # noqa: F401
    ExtPoint,
    IDENTITY,
    add,
    double,
    neg,
    scalar_mul,
    from_affine,
    to_affine,
    is_on_curve,
    eq,
)
from . import msm  # noqa: F401  (submodule; use oracle.msm.msm(...))
from .msm import msm_naive, split_scalar, n_windows  # noqa: F401
