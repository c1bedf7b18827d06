from jax_tpus_benchmark_physics_simulation_tpu.ckpt.checkpoint import (
    save_checkpoint,
    restore_checkpoint,
    latest_step,
    config_fingerprint,
)

__all__ = [
    "save_checkpoint",
    "restore_checkpoint",
    "latest_step",
    "config_fingerprint",
]
