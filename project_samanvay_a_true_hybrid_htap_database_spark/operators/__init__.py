from . import analytics, dedup, relational, similarity, text

__all__ = ["analytics", "relational", "dedup", "similarity", "text"]
