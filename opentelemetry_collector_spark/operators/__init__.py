from .attributes import Action, AttributesProcessor, apply_actions_to_map
from .filters import (
    AttributeCondition,
    MatchProperties,
    filterset_predicate,
    properties_predicate,
    include_exclude_keep,
)
from .sampler import ProbabilisticSampler
from .batch import batch_counts, batch_trigger_metrics

__all__ = [
    "Action",
    "AttributesProcessor",
    "apply_actions_to_map",
    "AttributeCondition",
    "MatchProperties",
    "filterset_predicate",
    "properties_predicate",
    "include_exclude_keep",
    "ProbabilisticSampler",
    "batch_counts",
    "batch_trigger_metrics",
]
