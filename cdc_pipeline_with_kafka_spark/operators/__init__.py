from . import (
    alerts,
    curation,
    dedup,
    multimodal,
    relational,
    similarity,
    skew,
    textstats,
    trends,
    windows,
)

__all__ = [
    "alerts",
    "curation",
    "dedup",
    "multimodal",
    "relational",
    "similarity",
    "skew",
    "textstats",
    "trends",
    "windows",
]
