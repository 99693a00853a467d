from . import dates, scoring, text

__all__ = ["dates", "scoring", "text"]
