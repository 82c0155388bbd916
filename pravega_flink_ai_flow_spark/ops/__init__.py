from . import relational, dedup, similarity, text, multimodal  # noqa: F401
