from .topk import topk_cosine, topk_cosine_lsh  # noqa: F401
