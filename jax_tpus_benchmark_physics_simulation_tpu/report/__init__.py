from jax_tpus_benchmark_physics_simulation_tpu.report import console, export, plots, media

__all__ = ["console", "export", "plots", "media"]
