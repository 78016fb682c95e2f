from .build import SolverConfig, build_lr_schedule, build_optimizer

__all__ = ["SolverConfig", "build_lr_schedule", "build_optimizer"]
