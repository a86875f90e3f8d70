from . import accum, dedup, ema, groupby, merge, multimodal, reshape, similarity, text, window  # noqa: F401
