from . import pipeline, sinks

__all__ = ["pipeline", "sinks"]
