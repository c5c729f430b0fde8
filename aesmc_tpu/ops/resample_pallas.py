"""Fused Pallas TPU resampling kernel (normalize -> cumsum -> inverse-CDF).

Placeholder module: `AVAILABLE` flips to True once the fused kernel lands;
until then `aesmc_tpu.resampling` routes 'auto' to the XLA implementation.
"""

AVAILABLE = False


def sample_ancestral_index_pallas(log_weight, key, method="systematic"):
    raise NotImplementedError(
        "Pallas resampling kernel not yet available; use "
        "implementation='xla'.")
