from tpufusion.ops.scatter import nearest_wins_scatter, scatter_count, scatter_max
from tpufusion.ops.components import connected_components

__all__ = [
    "nearest_wins_scatter",
    "scatter_count",
    "scatter_max",
    "connected_components",
]
