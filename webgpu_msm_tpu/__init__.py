"""tpu-msm: a TPU-native multi-scalar multiplication framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the ZPrize
"Beat the Best (Web)" reference (`ma-chengyuan/webgpu-msm`): Pippenger MSM
over Aleo's embedded twisted Edwards curve (ed-on-bls12-377), bit-exact, with
limb-planar Montgomery field kernels, on-device bucket accumulation and
reduction, and multi-chip scaling over a `jax.sharding.Mesh`.

Public API (parity with the reference's `compute_msm`, README.md:63):

    compute_msm(points, scalars) -> AffinePoint(x, y)
"""

__version__ = "0.1.0"

from .api import compute_msm, compute_msm_batch, AffinePoint, MSMPlan  # noqa: F401
from .config import MSMConfig  # noqa: F401
