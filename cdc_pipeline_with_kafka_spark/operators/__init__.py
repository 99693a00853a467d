from . import alerts, dedup, relational, similarity, textstats, trends, windows

__all__ = [
    "alerts",
    "dedup",
    "relational",
    "similarity",
    "textstats",
    "trends",
    "windows",
]
