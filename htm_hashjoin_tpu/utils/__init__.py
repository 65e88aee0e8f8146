from . import metrics, timing, validate

__all__ = ["metrics", "timing", "validate"]
