"""High-level simulation harness."""
from .simulation import MCMCSimulation

__all__ = ["MCMCSimulation"]
