"""esoo_tpu: TPU-native electronic-structure orbital-optimization framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
JoelHBierman/electronic-structure-orbital-optimization (OptOrbVQE and its
excited-state variants, arXiv:2208.14431 / arXiv:2310.09418), self-contained
from molecular integrals to the optimizers.
"""

import jax

# Chemistry needs float64 host math; TPU hot loops opt into f32 explicitly.
jax.config.update("jax_enable_x64", True)
# On TPU, f32 matmuls default to single-pass bf16 on the MXU (~3 decimal
# digits) — orders of magnitude too coarse for energy functionals.  Force
# full-f32 (3-pass) MXU accumulation; f64 paths are unaffected.
jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"
