from . import hashing, htap, textfns, vectors

__all__ = ["hashing", "htap", "textfns", "vectors"]
