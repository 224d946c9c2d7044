from . import analytics, dedup, multimodal, relational, similarity, text

__all__ = ["analytics", "relational", "dedup", "multimodal", "similarity", "text"]
