"""Hand-written Pallas TPU kernels for the aggregation hot path."""
from .aggregate import (
    fisher_stats_pallas,
    gmm_em_stats_pallas,
    lloyd_stats_pallas,
    vlad_aggregate_pallas,
)

__all__ = [
    "vlad_aggregate_pallas",
    "fisher_stats_pallas",
    "gmm_em_stats_pallas",
    "lloyd_stats_pallas",
]
