"""Temperature-ladder construction."""
from .ladders import construct_geometric_ladder, construct_iterative_ladder

__all__ = ["construct_geometric_ladder", "construct_iterative_ladder"]
