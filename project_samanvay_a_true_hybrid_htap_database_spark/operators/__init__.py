from . import dedup, relational, similarity, text

__all__ = ["relational", "dedup", "similarity", "text"]
